"""Stage breakdown of the full dual-ISO amaze-edge path at 1080p batch 16.

VERDICT r3 task 6: the full path runs 10.9 ms/frame; find the tail.
Uploads ONE synthetic frame over the relay and tiles to the batch on
device; every leg is timed with the chained-counter in-loop methodology.

Legs:
  hdr_check       hdr_check_batch
  analyze         _analyze_batch (fields/white/match + decisions)
  recon           reconstruct_batch amaze-edge (alias on, cs 0) — the path
  recon-noalias   same with use_alias=False (alias-map leg by difference)
  edgeleg         amaze_edge_interpolate standalone (squeeze + demosaic +
                  prep + pick)
  demosaic        amaze_demosaic alone on the squeezed image
  pick            edge_pick Pallas kernel alone
"""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import amaze as amz
from mlvfs_tpu.ops import dualiso_full as dif
from mlvfs_tpu.ops import evmath
from mlvfs_tpu.ops.amaze_core import amaze_demosaic
from mlvfs_tpu.ops.luts import EV_RESOLUTION

H = int(os.environ.get("PR_H", "1080"))
W = int(os.environ.get("PR_W", "1920"))
B = int(os.environ.get("PR_B", "16"))
BLACK, WHITE14 = 2048, 15000
black20 = BLACK * 64
white20 = 10000 * 64
white_ev = int(round(math.log2(white20 / 64.0 - black20 / 64.0) * EV_RESOLUTION))

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)

print("devices:", jax.devices(), flush=True)
img1 = jax.device_put(frame)  # ONE frame over the relay
imgs = jax.jit(lambda x: jnp.tile(x[None], (B, 1, 1)))(img1)
jax.block_until_ready(imgs)

row_bright = jnp.asarray(np.tile((np.arange(H) % 4) >= 2, (B, 1)))
s_arr = jnp.asarray(
    np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None].repeat(B, 0),
    jnp.int32,
)
a = jnp.full(B, 0.125, jnp.float32)
b20 = jnp.zeros(B, jnp.float32)
wd = jnp.full(B, white20 - 1000, jnp.int32)
ce = jnp.full(B, 3.0, jnp.float32)
ov = jnp.full(B, 3.0, jnp.float32)
lut = jnp.zeros(1, jnp.int32)
ev2raw0 = jnp.zeros(10 * EV_RESOLUTION + 1, jnp.int32)
frcurve = jnp.zeros(1, jnp.float32)


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


def leg_hdrcheck(c, x):
    return c + dif.hdr_check_batch(x, BLACK, WHITE14).sum(dtype=jnp.float32)


def leg_analyze(c, x):
    is_hdr = jnp.ones(B, bool)
    outs = dif._analyze_batch(x, is_hdr, 0, H, BLACK)
    return c + outs[3].sum(dtype=jnp.float32)


def recon(method, use_alias=True):
    def fn(c, x):
        out = dif.reconstruct_batch(
            x, row_bright, s_arr, a, b20, wd, ce, ov, lut, ev2raw0, frcurve,
            black20=black20, white20=white20, interp_method=method,
            use_fullres=True, use_alias=use_alias, cs_method=0,
            exact_luts=False, white_ev=white_ev,
        )
        return c + out.sum(dtype=jnp.float32) * 1e-9
    return fn


raw = jax.jit(lambda x: (x.astype(jnp.int32) << 6) & 0xFFFFF)(imgs)
jax.block_until_ready(raw)


def ev_of(x):
    return evmath.raw2ev20(x, black20)


def frcurve_of(x):
    return evmath.fullres_weight(x, black20)


def ev2raw_at(e):
    return evmath.ev2raw20(e, black20, white20, white_ev)


def leg_edge(c, x):
    def one(r, rb, ss):
        ev = ev_of(r)
        d, b = amz.amaze_edge_interpolate(
            r, ev, ev2raw_at, rb, ss, ev_of, frcurve_of,
            white20 - 1000, black20=black20, white20=white20,
        )
        return d + b
    o = jax.vmap(one)(x, row_bright, s_arr)
    return c + o.sum(dtype=jnp.float32) * 1e-9


def leg_demosaic(c, x):
    def one(r):
        red, grn, blu = amaze_demosaic(r.astype(jnp.float32))
        return red + grn + blu
    o = jax.vmap(one)(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9


def leg_pick(c, x):
    from mlvfs_tpu.ops.amaze_edge_pallas import edge_pick

    def one(r, ss):
        ev = ev_of(r)
        restricted = r < (white20 - 1000)
        return edge_pick(ev, ev, ev, ss, restricted, H, W)
    o = jax.vmap(one)(x, s_arr)
    return c + o.sum(dtype=jnp.float32) * 1e-9


LEGS = {
    "check": lambda: timeit("hdr_check", leg_hdrcheck, imgs),
    "analyze": lambda: timeit("analyze (fields/white/match/decide)", leg_analyze, imgs),
    "recon": lambda: timeit("reconstruct amaze-edge (alias on)", recon(0), imgs),
    "noalias": lambda: timeit("reconstruct amaze-edge (alias off)", recon(0, use_alias=False), imgs),
    "mean23": lambda: timeit("reconstruct mean23 (alias on)", recon(1), imgs),
    "edge": lambda: timeit("edge leg standalone (squeeze+demosaic+pick)", leg_edge, raw),
    "demosaic": lambda: timeit("amaze_demosaic alone", leg_demosaic, raw),
    "pick": lambda: timeit("edge_pick kernel alone", leg_pick, raw),
}
for leg in os.environ.get("PR_LEGS", ",".join(LEGS)).split(","):
    LEGS[leg.strip()]()
