"""Sub-stage split of the device dual-ISO analysis at 1080p batch 16.

VERDICT r3 task 6 follow-up: _analyze_batch is ~2.0 ms/frame of the full
path's 10.4; find which of fields/white/match carries it.

Measured (v5e-1, 1080p batch 16, steady state, r4):
  fields_stat_batch    0.50 ms/frame
  white_detect_batch   0.44 ms/frame
  match_exposures_batch 1.72 ms/frame (standalone; fuses tighter in the
                        full analyze program, which measures 2.0 total)
Rejected experiment: fusing white_detect's two per-bin 16-pass bisections
into one joint (2,)-lane loop measured 0.46 (host-exact, equality checked
against analysis.white_detect) — the per-pass element work is identical
either way and the per-op dispatch latency is negligible, so it was
reverted. match dominates; its internal split is in
tools/profile_match_split.py — no single piece is worth a redesign
(sort 0.66, bisection 0.31, RANSAC 0.33 ms/frame).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_analysis_dev as dev
from mlvfs_tpu.ops import dualiso_full as dif

H = int(os.environ.get("PR_H", "1080"))
W = int(os.environ.get("PR_W", "1920"))
B = int(os.environ.get("PR_B", "16"))
BLACK = 2048

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)

print("devices:", jax.devices(), flush=True)
img1 = jax.device_put(frame)
imgs = jax.jit(lambda x: jnp.tile(x[None], (B, 1, 1)))(img1)
jax.block_until_ready(imgs)

ibf = jnp.asarray(np.tile([False, False, True, True], (B, 1)))
black20s = jnp.full(B, BLACK * 64, jnp.int32)
min20s = jnp.full(B, 10000 * 64, jnp.int32)
max_pix = W * H // 2 // 9


def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/frame", flush=True)


def leg_fields(c, x):
    okf, ib = dev.fields_stat_batch(x, BLACK, 0)
    return c + okf.sum(dtype=jnp.float32) + ib.sum(dtype=jnp.float32)


def leg_white(c, x):
    wd, wb = dev.white_detect_batch(x, ibf, (0, 0, H, W), max_pix)
    return c + wd.sum(dtype=jnp.float32) + wb.sum(dtype=jnp.float32)


def leg_match(c, x):
    mok, a, b, wd = dev.match_exposures_batch(x, ibf, black20s, min20s, (H, W), 0)
    return c + a.sum(dtype=jnp.float32) + wd.sum(dtype=jnp.float32)


def leg_all(c, x):
    outs = dif._analyze_batch(x, jnp.ones(B, bool), 0, H, BLACK)
    return c + outs[3].sum(dtype=jnp.float32)


LEGS = {
    "fields": lambda: timeit("fields_stat_batch", leg_fields, imgs),
    "white": lambda: timeit("white_detect_batch", leg_white, imgs),
    "match": lambda: timeit("match_exposures_batch", leg_match, imgs),
    "all": lambda: timeit("analyze (all)", leg_all, imgs),
}
for leg in os.environ.get("PR_LEGS", ",".join(LEGS)).split(","):
    LEGS[leg.strip()]()
