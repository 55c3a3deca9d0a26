"""Convolution-reverb demo — the analog of the reference's csound/clconv.csd.

The reference demo plays a soundfile through convolution against a
reverb-style impulse response. Without a Csound runtime we synthesize the
source (a plucked arpeggio) and the IR (exponentially decaying noise — a
synthetic hall), run it through the streaming ClconvProcessor exactly as an
audio host would (fixed ksmps blocks, one-partition latency), and write a
.wav.

Run:  python examples/demo.py [out.wav]
"""

from __future__ import annotations

import struct
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opencl_fft_tpu.stream import ClconvProcessor, CltvconvProcessor

SR = 44100


def pluck(freq: float, dur: float, rng) -> np.ndarray:
    """Karplus-Strong pluck."""
    n = int(SR * dur)
    period = max(2, int(SR / freq))
    buf = rng.standard_normal(period).astype(np.float32)
    out = np.empty(n, np.float32)
    for i in range(n):
        out[i] = buf[i % period]
        buf[i % period] = 0.5 * (buf[i % period] + buf[(i + 1) % period]) * 0.996
    return out


def synth_source(rng) -> np.ndarray:
    notes = [220.0, 277.18, 329.63, 440.0, 329.63, 277.18]
    hop = int(SR * 0.35)
    total = hop * len(notes) + SR
    sig = np.zeros(total, np.float32)
    for i, f in enumerate(notes):
        p = pluck(f, 0.9, rng)
        sig[i * hop: i * hop + p.size] += p
    return 0.5 * sig / np.max(np.abs(sig))


def synth_hall_ir(seconds: float, rng) -> np.ndarray:
    n = int(SR * seconds)
    t = np.arange(n) / SR
    noise = rng.standard_normal(n).astype(np.float32)
    env = np.exp(-3.0 * t).astype(np.float32)
    ir = noise * env
    ir[0] = 1.0                     # direct sound
    return 0.25 * ir / np.max(np.abs(ir))


def write_wav(path: str, audio: np.ndarray) -> None:
    audio = np.clip(audio, -1.0, 1.0)
    pcm = (audio * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "demo_reverb.wav"
    rng = np.random.default_rng(2024)
    dry = synth_source(rng)
    ir = synth_hall_ir(1.5, rng)

    # the clconv.csd workload: audio through partitioned convolution,
    # parts=1024, processed in ksmps=64 blocks like a Csound orchestra
    ksmps = 64
    proc = ClconvProcessor(ir, parts=1024)
    pad = np.zeros((-dry.size) % ksmps, np.float32)
    stream = np.concatenate([dry, pad, np.zeros(ir.size + 1024, np.float32)])
    stream = stream[: stream.size - stream.size % ksmps]
    wet = np.concatenate([
        proc.process(stream[i: i + ksmps])
        for i in range(0, stream.size, ksmps)
    ])

    mix = 0.7 * np.pad(dry, (0, wet.size - dry.size)) + 0.6 * wet
    write_wav(out_path, mix / max(1.0, np.max(np.abs(mix))))
    print(f"wrote {out_path}: {wet.size / SR:.1f}s, "
          f"IR {ir.size} taps, parts=1024, ksmps={ksmps}")


if __name__ == "__main__":
    main()
