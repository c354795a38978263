"""Steady-state full cr2hdr20 path (analysis + reconstruction) at the
engine's default batch 16 with per-clip caches warm (Bayer order +
white20 fixed by the first batch) — the honest end-to-end dual-ISO
device cost, vs profile_reconstruct.py's reconstruction-only number."""
import os, sys, time, types
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_full as dif
from mlvfs_tpu.pipeline.config import ProcessingConfig

H = int(os.environ.get('PR_H', '960'))
W = int(os.environ.get('PR_W', '1280'))
B = int(os.environ.get('PR_B', '16'))
spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())

class FH: pass
fh = FH()
fh.raw_info = types.SimpleNamespace(black_level=spec.black, white_level=spec.white, bits_per_pixel=14)
fh.vidf = {"panPosX": 0, "panPosY": 0}
fh.idnt = {"cameraModel": 0x80000285}

class Cal:
    focus_pixel_list = None
    dual_iso_rggb = None

print("devices:", jax.devices(), flush=True)
for method, name in ((0, "amaze-edge"), (1, "mean23")):
    cfg = ProcessingConfig(dual_iso=2, hdr_interpolation_method=method)
    cal = Cal()
    out, ok = dif.cr2hdr20_batch(imgs, fh, cfg, cal)  # warm + cache rggb
    np.asarray(out[:, ::256, ::256])
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out, ok = dif.cr2hdr20_batch(imgs, fh, cfg, cal)
        np.asarray(out[:, ::256, ::256])
    dt = (time.perf_counter() - t0) / iters
    print(f"cr2hdr20 steady B=16 {name:10s} {dt*1e3:8.1f} ms/batch  {dt/B*1e3:6.2f} ms/frame  ok={np.asarray(ok).all()}", flush=True)
