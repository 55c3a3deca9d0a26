"""IR hot-swap demo — changing rooms on a live stream without a click.

Plays a synthesized arpeggio through the streaming convolution reverb and
replaces the impulse response MID-PHRASE: once instantly (the reference's
push_ir semantics, cl_conv.cpp:353-388 — audible as a discontinuity) and
once through the crossfaded hot-swap (`ClconvProcessor.set_ir`, beyond
parity), which blends the two exact convolutions per-sample. Writes both
renders to one A/B .wav (instant swap first, a beat of silence, then the
faded swap) and prints the largest sample-to-sample jump around each swap
point as the objective "click" measure.

Run:  python examples/hotswap_demo.py [out.wav]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo import SR, synth_source, synth_hall_ir, write_wav  # noqa: E402

from opencl_fft_tpu.stream import ClconvProcessor  # noqa: E402


def render(dry: np.ndarray, ir_a: np.ndarray, ir_b: np.ndarray,
           parts: int, swap_block: int, fade_blocks: int) -> np.ndarray:
    """Stream dry through reverb A, swapping to B at swap_block."""
    # the analysis size is fixed at construction: size the engine for the
    # longest IR it will ever hold (shorter ones zero-pad)
    maxlen = max(ir_a.size, ir_b.size)
    ir_a = np.pad(np.asarray(ir_a, np.float32), (0, maxlen - ir_a.size))
    proc = ClconvProcessor(ir_a, parts=parts)
    tail = np.zeros(maxlen + parts, np.float32)
    stream = np.concatenate([dry, tail])
    stream = stream[: stream.size - stream.size % parts]
    out = []
    for i in range(stream.size // parts):
        if i == swap_block:
            proc.set_ir(ir_b, fade_blocks=fade_blocks)
        out.append(proc.process(stream[i * parts: (i + 1) * parts]))
    return np.concatenate(out)


def max_jump(x: np.ndarray, lo: int, hi: int) -> float:
    """Largest sample-to-sample step in x[lo:hi] (the click metric)."""
    return float(np.max(np.abs(np.diff(x[lo:hi]))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "hotswap_ab.wav"
    rng = np.random.default_rng(7)
    dry = synth_source(rng)
    small = synth_hall_ir(0.4, rng)            # tight room
    # long, bright hall — maximally different so an instant swap clicks
    big = synth_hall_ir(1.8, np.random.default_rng(8)) * 1.4

    parts, fade = 1024, 8
    swap_block = int(1.2 * SR) // parts        # mid-phrase
    instant = render(dry, small, big, parts, swap_block, fade_blocks=0)
    faded = render(dry, small, big, parts, swap_block, fade_blocks=fade)

    # the engine output lags one partition; measure around the swap onset
    s0 = (swap_block + 1) * parts
    w = parts // 2
    j_inst = max_jump(instant, s0 - w, s0 + w)
    j_fade = max_jump(faded, s0 - w, s0 + w)
    # baseline: the same windows far from any swap
    j_base = max(max_jump(instant, s0 - 8 * parts, s0 - 7 * parts),
                 max_jump(faded, s0 - 8 * parts, s0 - 7 * parts))
    print(f"max |sample step| at the swap: instant {j_inst:.4f}, "
          f"faded {j_fade:.4f} (program baseline {j_base:.4f})")

    gap = np.zeros(SR // 2, np.float32)
    dry_pad = np.pad(dry, (0, instant.size - dry.size))
    mixed = np.concatenate([0.7 * dry_pad + 0.6 * instant, gap,
                            0.7 * dry_pad + 0.6 * faded])
    write_wav(out_path, mixed / max(1.0, np.max(np.abs(mixed))))
    print(f"wrote {out_path}: instant swap then faded swap "
          f"(swap at block {swap_block}, fade {fade} blocks = "
          f"{fade * parts / SR * 1000:.0f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
