"""Split the amaze-edge leg: input prep (desqueeze/gray/EV planes) vs edge_pick.

Stages after amaze_demosaic inside amaze_edge_interpolate (ops/amaze.py):
  prep   = desqueeze gathers + gray projection + evgray + EW_a/EW_b ev_class
           + restricted map                                  (XLA elementwise)
  pick   = edge_pick Pallas kernel on the three EV planes
  post   = ev2raw + region/border selects
"""

import time
import sys
import math

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import amaze as amz
from mlvfs_tpu.ops import evmath
from mlvfs_tpu.ops.amaze import squeeze_rows, _tdiv, _srow_shift, FULLRES_THR
from mlvfs_tpu.ops.amaze_core import amaze_demosaic
from mlvfs_tpu.ops.luts import EV_RESOLUTION

H, W, B = 960, 1280, 8
BLACK = 2048
black20, white20 = BLACK * 64, 10000 * 64
white_ev = int(round(math.log2(white20 / 64.0 - black20 / 64.0) * EV_RESOLUTION))
white_darkened = white20 - 1000

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())
raw = (imgs.astype(jnp.int32) << 6) & 0xFFFFF

row_bright = jnp.asarray(np.tile((np.arange(H) % 4) >= 2, (B, 1)))
s = jnp.asarray(
    np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None].repeat(B, 0),
    np.int32,
)


def ev_of(x):
    return evmath.raw2ev20(x, black20)


def frcurve_of(x):
    return evmath.fullres_weight(x, black20)


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
    return dt


def planes_one(raw1, rb1, s1):
    h, w = raw1.shape
    squeezed = squeeze_rows(rb1, h)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    green_site = (xx % 2) != (yy % 2)
    scaled = jnp.where(green_site, _tdiv(raw1 - black20, 2) + black20, raw1)
    inv = jnp.zeros(h, jnp.int32).at[squeezed].set(jnp.arange(h, dtype=jnp.int32))
    sq_img = scaled.astype(jnp.float32)[inv]
    red, grn, blu = amaze_demosaic(sq_img)
    grn = jnp.clip((grn - black20) * 2.0 + black20, 0, 0xFFFFF)
    red = jnp.clip(red, 0, 0xFFFFF)
    blu = jnp.clip(blu, 0, 0xFFFFF)
    return red[squeezed], grn[squeezed], blu[squeezed]


def prep_one(raw1, rb1, s1, U_r, U_g, U_b):
    h, w = raw1.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    gray = (U_g / 2.0 + U_r / 4.0 + U_b / 4.0).astype(jnp.int32)
    evgray = ev_of(gray)
    fc = frcurve_of(raw1)
    rb2 = rb1[:, None]
    restricted = jnp.where(rb2, raw1 < white_darkened, fc > FULLRES_THR)
    red_mask = (yy % 2 == 0) & (xx % 2 == 0)
    blue_mask = (yy % 2 == 1) & (xx % 2 == 1)

    def ev_class(dy_units):
        sel = [
            _srow_shift(U, s1 * np.sign(dy_units), abs(dy_units), 0)
            for U in (U_r, U_g, U_b)
        ]
        v = jnp.where(red_mask, sel[0], jnp.where(blue_mask, sel[2], sel[1]))
        return ev_of(jnp.clip(jnp.trunc(v), 0, 0xFFFFF).astype(jnp.int32))

    EW_a = ev_class(1)
    EW_b = ev_class(-2)
    return evgray, EW_a, EW_b, restricted


# precompute U planes once (device)
U = jax.jit(jax.vmap(planes_one))(raw, row_bright, s)
U = jax.tree_util.tree_map(lambda x: jax.block_until_ready(x), U)
U_r, U_g, U_b = U

PRE = jax.jit(jax.vmap(prep_one))(raw, row_bright, s, U_r, U_g, U_b)
PRE = jax.tree_util.tree_map(lambda x: jax.block_until_ready(x), PRE)
evgray, EW_a, EW_b, restricted = PRE


def t_planes(c, raw, rb, s):
    o = jax.vmap(planes_one)(raw, rb, s)
    return c + sum(x.sum(dtype=jnp.float32) for x in o) * 1e-9


def t_prep(c, raw, rb, s, U_r, U_g, U_b):
    o = jax.vmap(prep_one)(raw, rb, s, U_r, U_g, U_b)
    return c + sum(x.sum(dtype=jnp.float32) for x in o) * 1e-9


def t_pick(c, evgray, EW_a, EW_b, s, restricted):
    from mlvfs_tpu.ops.amaze_edge_pallas import edge_pick

    o = jax.vmap(lambda e, a, b, ss, r: edge_pick(e, a, b, ss, r, H, W))(
        evgray, EW_a, EW_b, s, restricted
    )
    return c + o.sum(dtype=jnp.float32) * 1e-9


def t_full(c, raw, rb, s):
    def one(raw1, rb1, s1):
        ev = ev_of(raw1)
        d, b = amz.amaze_edge_interpolate(
            raw1, ev, lambda e: evmath.ev2raw20(e, black20, white20, white_ev),
            rb1, s1, ev_of, frcurve_of, white_darkened,
            black20=black20, white20=white20,
        )
        return d + b
    o = jax.vmap(one)(raw, rb, s)
    return c + o.sum(dtype=jnp.float32) * 1e-9


# Measured and rejected (r3): a fused variant of edge_pick that computed
# the gray/EW_a/EW_b EV planes inside the Pallas kernel (evarith double-
# single transforms in VMEM, planes never in HBM) timed 3.30 ms/frame vs
# 3.24 for the XLA-prep + edge_pick composition at 1280x960xB8 — XLA
# already fuses the prep into the demosaic epilogue, and the in-kernel
# arithmetic EV transform costs as much VPU time as the plane traffic it
# saves. Equivalence was gated bit-exact on TPU before rejection.


print("devices:", jax.devices(), flush=True)
timeit("planes: squeeze+demosaic+desqueeze", t_planes, raw, row_bright, s)
timeit("prep: gray+evgray+EW_a/EW_b+restricted", t_prep, raw, row_bright, s, U_r, U_g, U_b)
timeit("pick: edge_pick pallas", t_pick, evgray, EW_a, EW_b, s, restricted)
timeit("full amaze_edge_interpolate", t_full, raw, row_bright, s)
