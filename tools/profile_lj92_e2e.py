"""Compressed-clip END-TO-END rate: does the prefetcher hide entropy decode?

VERDICT r4 weak #6 / task 8: LJ92 decode (63 f/s/core) and the device leg
were benched separately; whether `--prefetch` actually overlaps host entropy
decode with the device leg at rate was asserted by design, not measured.

This harness converts three otherwise-identical 1080p clips end-to-end
through the real engine (prefetch depth 2, batch 16) on the default backend
(here the relay TPU, whose ~15 MB/s tunnel makes the device leg the slow
stage — the same bracket as BENCH_MODE=e2e) and compares each compressed
rate against the serial expectation 1/(1/e2e_uncompressed + 1/decode_rate):

  uncompressed   the device-leg-only e2e anchor (no host decode stage)
  lzma           decode ~3.9 f/s/core (~256 ms/frame on this 1-core host)
                 — decode and device leg are comparable, so overlap is the
                 difference between ~1.5 f/s (serial) and ~2.4 f/s (hidden).
                 liblzma releases the GIL; the relay wait is network I/O,
                 so both overlap even on one core.
  lj92           decode ~16 ms/frame — hides under any device leg; its
                 overlap signal vs serial is ~4%, below host noise, so the
                 recorded claim rides on the LZMA leg (same prefetcher,
                 same fetch_batch code path, heavier decode).

overlap = (1/serial_expectation) achieved fraction: 1.0 = fully hidden
decode, 0.0 = fully serial.

Run:  python tools/profile_lj92_e2e.py [frames=48] [reps=3]
"""

import dataclasses
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from mlvfs_tpu.format import synth
    from mlvfs_tpu.format.reader import MLVClip
    from mlvfs_tpu.pipeline.config import ProcessingConfig
    from mlvfs_tpu.pipeline.convert import ClipConverter

    B = 16
    spec = synth.SynthSpec(width=1920, height=1080, frames=frames, seed=7)
    rng = np.random.default_rng(spec.seed)
    frame = synth.make_frame_data(spec, rng)
    data = np.ascontiguousarray(
        np.broadcast_to(frame, (frames, spec.height, spec.width))
    )
    tmp = tempfile.mkdtemp(
        prefix="lj92e2e_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    results = {}
    decode_ms = {}
    try:
        comps = ("none", "lj92", "lzma")
        convs = {}
        for comp in comps:
            src = os.path.join(tmp, f"B_{comp}.MLV")
            cspec = dataclasses.replace(spec, compression=comp)
            synth.write_mlv(src, cspec, frame_data=data)
            convs[comp] = ClipConverter(
                MLVClip(src, populate=True),
                ProcessingConfig(batch_size=B, prefetch=2),
            )
            convs[comp].convert(
                os.path.join(tmp, f"out_{comp}"), frames=range(B)
            )  # compile + warm
        # INTERLEAVED reps: the relay tunnel's throughput drifts on minute
        # scales on this shared rig, so timing each compression in its own
        # sequential block hands one comp the slow window (a first pass
        # measured lj92 at 0.52x the anchor that way — fully reversed by
        # reordering). Round-robin pairs each comp with the same tunnel
        # conditions; the median then compares like with like.
        fps = {c: [] for c in comps}
        for _ in range(reps):
            for comp in comps:
                t0 = time.perf_counter()
                paths = convs[comp].convert(
                    os.path.join(tmp, f"out_{comp}"), frames=range(frames)
                )
                fps[comp].append(len(paths) / (time.perf_counter() - t0))
        for comp in comps:
            conv = convs[comp]
            # the decode stage alone, at rate (batch fan-out), for the
            # serial-expectation arithmetic
            if comp != "none":
                dec = (
                    conv._decode_batch_host
                    if comp == "lj92"
                    else conv._lzma_batch_host
                )
                idx = list(range(B))
                dec(idx)
                t0 = time.perf_counter()
                for _ in range(3):
                    dec(idx)
                decode_ms[comp] = (time.perf_counter() - t0) / (3 * B) * 1e3
            conv.close()
            results[comp] = statistics.median(fps[comp])
            print(f"{comp:6s} e2e {results[comp]:6.3f} f/s "
                  f"(reps {', '.join(f'{x:.3f}' for x in fps[comp])})",
                  flush=True)

        anchor = results["none"]
        print(f"\nanchor (no decode stage): {anchor:.3f} f/s")
        for comp in ("lj92", "lzma"):
            dec_fps = 1e3 / decode_ms[comp]
            serial = 1.0 / (1.0 / anchor + 1.0 / dec_fps)
            achieved = results[comp]
            overlap = (
                (1 / serial - 1 / achieved) / (1 / serial - 1 / anchor)
                if anchor > serial
                else float("nan")
            )
            print(
                f"{comp:6s} decode {decode_ms[comp]:6.1f} ms/f ({dec_fps:5.1f} f/s)"
                f"  serial-expect {serial:5.3f} f/s  achieved {achieved:5.3f}"
                f"  decode hidden {overlap*100:5.1f}%"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
