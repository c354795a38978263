"""Benchmark: 1080p 14-bit RAW→DNG conversion throughput, frames/sec/chip.

Prints one JSON line for the driver. Baseline target (BASELINE.md): >500
frames/sec/chip on a TPU v5e-1 — the reference publishes no numbers, so
vs_baseline is measured against that driver-provided target.

The measured quantity is honest end-to-end conversion: indexed MLV clip on
disk → packed-frame batches → device unpack → DNG files written to a tmpfs
directory (header synthesis + file writes included).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mlvfs_tpu.format import synth
    from mlvfs_tpu.format.reader import MLVClip
    from mlvfs_tpu.pipeline.config import ProcessingConfig
    from mlvfs_tpu.pipeline.convert import ClipConverter

    frames = int(os.environ.get("BENCH_FRAMES", "192"))
    width, height = 1920, 1080
    tmp = tempfile.mkdtemp(prefix="mlvfs_bench_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    src = os.path.join(tmp, "BENCH.MLV")

    # synthesize the clip once (packed 14-bit 1080p)
    rng = np.random.default_rng(7)
    spec = synth.SynthSpec(width=width, height=height, frames=1, bpp=14)
    frame = synth.make_frame_data(spec, rng)
    data = np.broadcast_to(frame, (frames, height, width))
    synth.write_mlv(src, spec, frame_data=np.ascontiguousarray(data))

    outdir = os.path.join(tmp, "out")
    config = ProcessingConfig(batch_size=int(os.environ.get("BENCH_BATCH", "24")))

    clip = MLVClip(src)
    conv = ClipConverter(clip, config)
    # warmup: compile + first batch
    conv.convert(outdir, frames=range(config.batch_size))

    t0 = time.perf_counter()
    paths = conv.convert(outdir, frames=range(frames))
    dt = time.perf_counter() - t0
    conv.close()

    fps = len(paths) / dt
    print(
        json.dumps(
            {
                "metric": "1080p_14bit_raw_to_dng_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
