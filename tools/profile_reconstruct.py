"""End-to-end reconstruct_batch profile + scan stages at real size (hp=992)."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_full as dif
from mlvfs_tpu.ops import amaze_core as core
from mlvfs_tpu.ops.luts import EV_RESOLUTION

import os as _os
H = int(_os.environ.get("PR_H", "960"))
W = int(_os.environ.get("PR_W", "1280"))
B = int(_os.environ.get("PR_B", "8"))
BLACK, WHITE14 = 2048, 15000

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())

row_bright = jnp.asarray(np.tile((np.arange(H) % 4) >= 2, (B, 1)))
s_arr = jnp.asarray(
    np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None].repeat(B, 0),
    jnp.int32,
)
black20 = BLACK * 64
white20 = 10000 * 64
import math
white_ev = int(round(math.log2(white20 / 64.0 - black20 / 64.0) * EV_RESOLUTION))

a = jnp.full(B, 0.125, jnp.float32)
b20 = jnp.zeros(B, jnp.float32)
wd = jnp.full(B, white20 - 1000, jnp.int32)
ce = jnp.full(B, 3.0, jnp.float32)
ov = jnp.full(B, 3.0, jnp.float32)
lut = jnp.zeros(1, jnp.int32)
ev2raw0 = jnp.zeros(10 * EV_RESOLUTION + 1, jnp.int32)
frcurve = jnp.zeros(1, jnp.float32)


def timeit(name, fn, *args, iters=4):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/frame", flush=True)


def recon(method, use_alias=True, use_fullres=True):
    def fn(c, imgs):
        out = dif.reconstruct_batch(
            imgs, row_bright, s_arr, a, b20, wd, ce, ov, lut, ev2raw0, frcurve,
            black20=black20, white20=white20, interp_method=method,
            use_fullres=use_fullres, use_alias=use_alias, cs_method=0,
            exact_luts=False, white_ev=white_ev,
        )
        return c + out.sum(dtype=jnp.float32) * 1e-9
    return fn


# scans at the real amaze size (squeezed full frame, padded)
hp, wp = H + 32, W + 32
xb = jnp.asarray(np.random.default_rng(0).random((B, hp, wp)).astype(np.float32))
rbm = jnp.ones((hp, wp), jnp.float32)


def scan_refine(c, x):
    o = jax.vmap(lambda xi: core._neighbor_refine_scan(xi, hp, wp))(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9


def scan_dilate(c, x):
    o = jax.vmap(lambda xi: core._nyquist_dilate(xi, rbm, hp, wp))(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9


def scan_chroma(c, x):
    def one(xi):
        p, q = core._chroma_smooth_scan(xi, xi + 1.0, rbm > 0, rbm > 0, hp, wp)
        return p + q
    o = jax.vmap(one)(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9


print("devices:", jax.devices(), flush=True)
timeit("reconstruct amaze-edge (alias on)", recon(0), imgs)
timeit("reconstruct amaze-edge (alias off)", recon(0, use_alias=False), imgs)
timeit("reconstruct mean23 (alias on)", recon(1), imgs)
timeit("scan: refine @hp=992", scan_refine, xb)
timeit("scan: nyquist dilate @hp=992", scan_dilate, xb)
timeit("scan: chroma smooth @hp=992", scan_chroma, xb)
