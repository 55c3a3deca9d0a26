"""True-stereo convolution-reverb demo (MatrixConvolver).

The reference is strictly 1-in 1-out (csound/opcode.cpp:157-253): a
true-stereo reverb there takes four `clconv` instances plus manual
mixing in the orchestra. Here the whole 2-in -> 2-out IR matrix (LL,
LR, RL, RR) runs as ONE batched device step per block.

The source is the demo arpeggio panned across the stereo field; the IR
matrix is a synthetic hall whose direct paths (LL, RR) are bright and
whose cross paths (LR, RL) are delayed, darker bleed — the classic
true-stereo topology. Output is a stereo .wav.

Run:  python examples/stereo_demo.py [out.wav]
"""

from __future__ import annotations

import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo import SR, synth_hall_ir, synth_source  # noqa: E402

from opencl_fft_tpu.models.convolver import MatrixConvolver  # noqa: E402
from opencl_fft_tpu.ops import pconv as P  # noqa: E402


def synth_stereo_source(rng) -> np.ndarray:
    """(2, T) — the demo arpeggio auto-panned L->R and back."""
    mono = synth_source(rng)
    t = np.arange(mono.size, dtype=np.float32) / SR
    pan = 0.5 * (1.0 + np.sin(2.0 * np.pi * 0.25 * t))  # 0..1, 4 s period
    return np.stack([mono * np.sqrt(1.0 - pan), mono * np.sqrt(pan)])


def synth_ir_matrix(seconds: float, cvs: int, rng) -> np.ndarray:
    """(2, 2, cvs) hall matrix: direct LL/RR + delayed, darker LR/RL."""
    irs = np.zeros((2, 2, cvs), np.float32)
    for o in range(2):
        direct = synth_hall_ir(seconds, rng)
        n = min(direct.size, cvs)
        irs[o, o, :n] = direct[:n]
        # cross-bleed: 11 ms early-reflection delay, -9 dB, one-pole lowpass
        bleed = synth_hall_ir(seconds * 0.8, rng)
        for i in range(1, bleed.size):
            bleed[i] += 0.6 * (bleed[i - 1] - bleed[i])
        d = int(0.011 * SR)
        m = min(bleed.size, cvs - d)
        irs[o, 1 - o, d:d + m] = 0.35 * bleed[:m]
    return irs


def write_stereo_wav(path: str, audio: np.ndarray) -> None:
    """audio: (2, T) in [-1, 1]."""
    pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.T.reshape(-1).tobytes())  # interleave L R L R ...


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "stereo_reverb.wav"
    rng = np.random.default_rng(2024)
    dry = synth_stereo_source(rng)                       # (2, T)

    pts = 1024
    ir_seconds = 1.5
    ir_len = int(SR * ir_seconds)
    ir_len += (-ir_len) % pts                 # round up to whole partitions
    cfg = P.PconvConfig.for_ir_length(ir_len, pts)
    irs = synth_ir_matrix(ir_seconds, cfg.cvs, rng)

    conv = MatrixConvolver(cfg, n_in=2, n_out=2)
    conv.push_ir(irs)

    tail = cfg.cvs + pts
    T = dry.shape[1] + tail
    T += (-T) % pts           # round UP: keep the full reverb decay
    stream = np.zeros((2, T), np.float32)
    stream[:, : dry.shape[1]] = dry
    blocks = stream.reshape(2, -1, pts).transpose(1, 0, 2)  # (nblk, 2, pts)
    wet = np.asarray(conv.stream(blocks))                   # (nblk, 2, pts)
    wet = wet.transpose(1, 0, 2).reshape(2, -1)

    mix = 0.7 * stream + 0.6 * wet
    write_stereo_wav(out_path, mix / max(1.0, np.max(np.abs(mix))))
    print(f"wrote {out_path}: stereo, {wet.shape[1] / SR:.1f}s, "
          f"4-IR matrix ({cfg.cvs} taps each), parts={pts}")


if __name__ == "__main__":
    main()
