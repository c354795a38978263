"""Wall-clock of the full cr2hdr20_batch (analysis + reconstruct) on TPU."""

import time
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_full as dif
from mlvfs_tpu.pipeline.config import ProcessingConfig

H, W, B = 960, 1280, 8
spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())


class FH:
    pass


fh = FH()
fh.raw_info = types.SimpleNamespace(
    black_level=spec.black, white_level=spec.white, bits_per_pixel=14
)
fh.vidf = {"panPosX": 0, "panPosY": 0}
fh.idnt = {"cameraModel": 0x80000285}

for method, name in ((0, "amaze-edge"), (1, "mean23"), (0, "amaze-edge2"), (1, "mean23-2")):
    cfg = ProcessingConfig(dual_iso=2, hdr_interpolation_method=method)
    out, ok = dif.cr2hdr20_batch(imgs, fh, cfg, None)
    np.asarray(out)  # force
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out, ok = dif.cr2hdr20_batch(imgs, fh, cfg, None)
        np.asarray(out[:, ::256, ::256])  # force with a tiny pull
    dt = (time.perf_counter() - t0) / iters
    print(f"cr2hdr20_batch {name:10s} {dt*1e3:8.1f} ms/batch  {dt/B*1e3:6.2f} ms/frame  ok={np.asarray(ok).all()}", flush=True)
