"""Time-varying convolution demo — the `cltvconv` use-case.

Cross-synthesizes two live signals (the reference's time-varying
convolution where the "impulse response" is itself an audio stream,
csound/README.md:6-11): a rhythmic noise burst pattern convolved with an
evolving harmonic drone. The drone stream is frozen periodically
(freeze2) to hold a spectral snapshot, exactly how the opcode's freeze
controls are meant to be played.

Run:  python examples/tvconv_demo.py [out.wav]
"""

from __future__ import annotations

import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opencl_fft_tpu.stream import CltvconvProcessor

SR = 44100


def noise_bursts(total: int, rng) -> np.ndarray:
    out = np.zeros(total, np.float32)
    period = int(SR * 0.25)
    for start in range(0, total - period, period):
        n = int(SR * 0.03)
        env = np.exp(-np.arange(n) / (SR * 0.005)).astype(np.float32)
        out[start: start + n] = rng.standard_normal(n).astype(np.float32) * env
    return out


def drone(total: int) -> np.ndarray:
    t = np.arange(total) / SR
    f0 = 110.0
    sig = np.zeros(total, np.float32)
    for k, amp in [(1, 1.0), (2, 0.5), (3, 0.33), (5, 0.2), (8, 0.12)]:
        vib = 1.0 + 0.002 * np.sin(2 * np.pi * (0.1 * k) * t)
        sig += amp * np.sin(2 * np.pi * f0 * k * vib * t).astype(np.float32)
    return (0.3 * sig / np.max(np.abs(sig))).astype(np.float32)


def write_wav(path: str, audio: np.ndarray) -> None:
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tvconv_demo.wav"
    rng = np.random.default_rng(7)
    dur = 6.0
    total = int(SR * dur)
    a = noise_bursts(total, rng)
    b = drone(total)

    parts, size = 512, 512 * 8
    tv = CltvconvProcessor(parts, size)
    block = 256
    outs = []
    for i in range(total // block):
        t = i * block / SR
        # freeze the drone's spectral ring for the middle two seconds
        frz2 = not (2.0 < t < 4.0)
        outs.append(tv.process(a[i * block:(i + 1) * block],
                               b[i * block:(i + 1) * block],
                               freeze2=frz2))
    wet = np.concatenate(outs)
    write_wav(out_path, 0.8 * wet / max(1e-9, np.max(np.abs(wet))))
    print(f"wrote {out_path}: {dur:.0f}s cross-synthesis, "
          f"parts={parts}, conv size={size}, freeze2 gated at 2-4s")


if __name__ == "__main__":
    main()
