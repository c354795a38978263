"""LJ92 codec single-core profile: ms/frame decode + encode at 1080p 14-bit.

Times the native codec (mlvfs_tpu/native/lj92.cpp) on a synthetic Bayer
frame encoded as the DNG writer does (2 interleaved components, predictor
1), single-threaded — comparable to BASELINE.md's reference-C anchors
(lj92.c decode 18.1 ms/frame, encode 37.2 ms/frame at this geometry).

Env: PJ_H/PJ_W (default 1080/1920), PJ_REPS (default 20).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

from mlvfs_tpu.format import synth
from mlvfs_tpu.codecs import lj92

H = int(os.environ.get("PJ_H", "1080"))
W = int(os.environ.get("PJ_W", "1920"))
REPS = int(os.environ.get("PJ_REPS", "20"))

rng = np.random.default_rng(11)
spec = synth.SynthSpec(width=W, height=H, frames=1, bpp=14)
frame = synth.make_frame_data(spec, rng).astype(np.uint16)
img = np.ascontiguousarray(frame)

enc = lj92.encode_batch(img[None], ncomp=2, bits=16)
blob = enc[0]
print(f"{W}x{H} 14-bit synthetic: encoded {len(blob)} bytes "
      f"({len(blob) / (W * H * 2):.2%} of raw)")

# decode: one stream, one thread, best-of timing
out, rcs = lj92.decode_batch([blob], frame_samples=W * H, n_threads=1)
assert rcs[0] == 0 and (out[0].reshape(H, W) == img).all(), "roundtrip mismatch"

best = min(
    (lambda t0: (lj92.decode_batch([blob] * 4, frame_samples=W * H, n_threads=1),
                 time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(REPS)
)
print(f"decode: {best / 4 * 1e3:7.2f} ms/frame single-thread "
      f"({W * H / (best / 4) / 1e6:.1f} Mpx/s)")

imgs4 = np.broadcast_to(img, (4, H, W))
imgs4 = np.ascontiguousarray(imgs4)
best = min(
    (lambda t0: (lj92.encode_batch(imgs4, ncomp=2, bits=16, n_threads=1),
                 time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(REPS)
)
print(f"encode: {best / 4 * 1e3:7.2f} ms/frame single-thread "
      f"({W * H / (best / 4) / 1e6:.1f} Mpx/s)")
