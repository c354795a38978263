"""Stage-level profiling of the dual-ISO amaze-edge path on the real TPU.

Chained-reduction timing (carry a scalar through every iteration) because
block_until_ready returns early through the axon relay.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import dualiso_full as dif
from mlvfs_tpu.ops import amaze as amz
from mlvfs_tpu.ops import amaze_core as core
from mlvfs_tpu.ops import evmath

H, W, B = 960, 1280, 8
BLACK, WHITE = 2048, 15000
black20, white20 = BLACK * 64, 10000 * 64

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())

row_bright = jnp.asarray(np.tile((np.arange(H) % 4) >= 2, (B, 1)))
s = jnp.asarray(np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None].repeat(B, 0), np.int32)

import math
white_ev = int(round(math.log2(white20 / 64.0 - black20 / 64.0) * 32768))


def ev_of(x):
    return evmath.raw2ev20(x, black20)


def ev2raw_at(x):
    return evmath.ev2raw20(x, black20, white20, white_ev)


def frcurve_of(x):
    return evmath.fullres_weight(x, black20)


def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    r = f(c, *args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
        if isinstance(c, tuple):
            c = c[0]
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch  {dt/B*1e3:6.2f} ms/frame")
    return dt


raw20 = (imgs.astype(jnp.int32) << 6)

# 1. full amaze_edge_interpolate
def full(c, raw20, rb, s):
    def one(r, rbi, si):
        d, b = amz.amaze_edge_interpolate(
            r, ev_of(r), ev2raw_at, rbi, si, ev_of, frcurve_of, white20,
            black20=black20, white20=white20)
        return d + b
    o = jax.vmap(one)(raw20, rb, s)
    return c + o.sum(dtype=jnp.float32) * 1e-9

# 2. amaze_demosaic core alone
def demosaic(c, raw20):
    def one(r):
        rr, gg, bb = core.amaze_demosaic(r.astype(jnp.float32))
        return rr + gg + bb
    o = jax.vmap(one)(raw20)
    return c + o.sum(dtype=jnp.float32) * 1e-9

# 3. scorer alone (12-dir box11 over evgray)
def scorer(c, raw20, rb, s):
    def one(r, rbi, si):
        evgray = ev_of(r)
        T = {
            2: amz._srow_shift(evgray, si, 2, 0),
            1: amz._srow_shift(evgray, si, 1, 0),
            -2: amz._srow_shift(evgray, -si, 2, 0),
            -3: amz._srow_shift(evgray, -si, 3, 0),
        }
        from mlvfs_tpu.ops.amaze import _sh, SEARCH_AREA, EDGE_DIRECTIONS

        def box11(d):
            cs = jnp.cumsum(d, axis=-1)
            return _sh(cs, 0, SEARCH_AREA) - _sh(cs, 0, -SEARCH_AREA - 1)

        e = []
        for (ack, a, b, bck) in EDGE_DIRECTIONS:
            p1 = _sh(T[ack[1]], 0, ack[0])
            p2 = _sh(T[a[1]], 0, a[0])
            p3 = _sh(T[b[1]], 0, b[0])
            p4 = _sh(T[bck[1]], 0, bck[0])
            d = jnp.abs(p1 - p2) + jnp.abs(p2 - p3) + jnp.abs(p3 - p4)
            e.append(box11(d))
        st = jnp.stack(e)
        return jnp.argmin(st, axis=0).astype(jnp.int32)
    o = jax.vmap(one)(raw20, rb, s)
    return c + o.sum(dtype=jnp.float32) * 1e-9

# 4. interpolation + pick chains
def interp(c, raw20, rb, s):
    def one(r, rbi, si):
        h, w = r.shape
        yy = jnp.arange(h)[:, None]; xx = jnp.arange(w)[None, :]
        red_mask = (yy % 2 == 0) & (xx % 2 == 0)
        blue_mask = (yy % 2 == 1) & (xx % 2 == 1)
        U = r.astype(jnp.float32)
        def ev_class(dy):
            sel = [amz._srow_shift(U, si * int(np.sign(dy)), abs(dy), 0) for _ in range(3)]
            v = jnp.where(red_mask, sel[0], jnp.where(blue_mask, sel[2], sel[1]))
            return ev_of(jnp.clip(jnp.trunc(v), 0, 0xFFFFF).astype(jnp.int32))
        EW_a = ev_class(1); EW_b = ev_class(-2)
        from mlvfs_tpu.ops.amaze import _sh, EDGE_DIRECTIONS, _tdiv
        pis = [
            _tdiv(_sh(EW_a, 0, a[0]) * 2 + _sh(EW_b, 0, b[0]), 3)
            for (ack, a, b, bck) in EDGE_DIRECTIONS
        ]
        st = jnp.stack(pis)
        idx = (r % 12).astype(jnp.int32)
        acc = st[0]
        for d in range(1, 12):
            acc = jnp.where(idx == d, st[d], acc)
        return ev2raw_at(acc)
    o = jax.vmap(one)(raw20, rb, s)
    return c + o.sum(dtype=jnp.float32) * 1e-9

# 5. core sub-stages: the three sequential scans on one padded frame
hp, wp = H // 2 + 32, W + 32
ny = jnp.asarray((np.random.default_rng(0).random((hp, wp)) > 0.5).astype(np.float32))
rbm = jnp.asarray(np.ones((hp, wp), np.float32))

def scan_refine(c, x):
    def one(xi):
        return core._neighbor_refine_scan(xi, hp, wp)
    o = jax.vmap(one)(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9

def scan_dilate(c, x):
    def one(xi):
        return core._nyquist_dilate(xi, rbm, hp, wp)
    o = jax.vmap(one)(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9

def scan_chroma(c, x):
    def one(xi):
        a, b = core._chroma_smooth_scan(xi, xi + 1.0, rbm > 0, rbm > 0, hp, wp)
        return a + b
    o = jax.vmap(one)(x)
    return c + o.sum(dtype=jnp.float32) * 1e-9


print(f"devices: {jax.devices()}")
xb = jnp.broadcast_to(ny, (B, hp, wp)) + jnp.arange(B, dtype=jnp.float32)[:, None, None] * 0
timeit("full amaze_edge", full, raw20, row_bright, s)
timeit("  amaze_demosaic core", demosaic, raw20)
timeit("    scan: refine (x2/call)", scan_refine, xb)
timeit("    scan: nyquist dilate", scan_dilate, xb)
timeit("    scan: chroma smooth", scan_chroma, xb)
timeit("  scorer (12-dir box11)", scorer, raw20, row_bright, s)
timeit("  interp+pick", interp, raw20, row_bright, s)
