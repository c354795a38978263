"""Pallas TPU kernel for the dual-ISO edge scorer + directional pick.

The 12-direction scorer (hdr.c:1094-1175) and the dir-averaged pick
(hdr.c:1182-1210) are lane/row stencils over three EV planes. The XLA
form (`amaze.edge_pick_xla`) is ~150 shifted elementwise passes over
HBM-resident frames; here each row chunk runs the whole chain in VMEM —
the planes are read once and the picked EV-index plane written once.

Chunked exactly like ops/alias_pallas.py: zero row padding reproduces the
XLA `_shift` out-of-frame fill, overlapping fixed-shape chunks discard
their 8-row aprons (row reach is +-3), and lane shifts are pltpu.roll
plus an iota column mask. Equivalence with edge_pick_xla is gated
bit-for-bit in tests/test_parity_dualiso_full.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .luts import EV_RESOLUTION

APRON = 8
CORE = 256


def _kernel(y0_ref, evgray_ref, ewa_ref, ewb_ref, s_ref, restr_ref, out_ref,
            *, h: int, w: int):
    from .amaze import EDGE_DIRECTIONS, D0, SEARCH_AREA

    evgray = evgray_ref[...]
    EW_a = ewa_ref[...]
    EW_b = ewb_ref[...]
    s_col = s_ref[...]  # (rp, 1)
    restricted = restr_ref[...] != 0
    rp = evgray.shape[0]
    y0 = y0_ref[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, evgray.shape, 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, evgray.shape, 1)

    def tdiv(a, b):
        q = jnp.abs(a) // b
        return jnp.where(a < 0, -q, q)

    def rshift(a, dy):
        # rows: chunk-local roll; out-of-frame rows hold the zero padding
        return pltpu.roll(a, (-dy) % rp, axis=0) if dy else a

    cache = {}

    def lshift(a, tag, dx):
        # out[., x] = a[., x+dx], zero outside the frame (the `_sh` fill)
        if dx == 0:
            return a
        key = (tag, dx)
        v = cache.get(key)
        if v is None:
            v = pltpu.roll(a, (-dx) % w, axis=1)
            v = jnp.where((xx + dx >= 0) & (xx + dx < w), v, 0)
            cache[key] = v
        return v

    s_plus = s_col == 1

    def srow(a, sgn, mag):
        return jnp.where(s_plus, rshift(a, sgn * mag), rshift(a, -sgn * mag))

    T = {
        2: srow(evgray, 1, 2),
        1: srow(evgray, 1, 1),
        -2: srow(evgray, -1, 2),
        -3: srow(evgray, -1, 3),
    }
    Ttag = {2: "t2", 1: "t1", -2: "tm2", -3: "tm3"}

    def box11(d):
        s2 = d + _lane(d, 1, xx, w)
        s4 = s2 + _lane(s2, 2, xx, w)
        s8 = s4 + _lane(s4, 4, xx, w)
        return (
            _lane(s8, -SEARCH_AREA, xx, w)
            + _lane(s2, 3, xx, w)
            + _lane(d, SEARCH_AREA, xx, w)
        )

    best = None
    d_best = None
    for di, (ack, a, b, bck) in enumerate(EDGE_DIRECTIONS):
        p1 = lshift(T[ack[1]], Ttag[ack[1]], ack[0])
        p2 = lshift(T[a[1]], Ttag[a[1]], a[0])
        p3 = lshift(T[b[1]], Ttag[b[1]], b[0])
        p4 = lshift(T[bck[1]], Ttag[bck[1]], bck[0])
        d = jnp.abs(p1 - p2) + jnp.abs(p2 - p3) + jnp.abs(p3 - p4)
        score = box11(d) + abs(di - D0) * EV_RESOLUTION // 8
        if best is None:
            best, d_best = score, jnp.zeros_like(score)
        else:
            take = score < best
            best = jnp.where(take, score, best)
            d_best = jnp.where(take, di, d_best)
    d_best = d_best.astype(jnp.int32)
    d_best = jnp.where(restricted, D0, d_best)
    window = (yy >= 5) & (yy < h - 5) & (xx >= 5) & (xx < w - 5)
    d_best = jnp.where(window, d_best, D0)

    nd = len(EDGE_DIRECTIONS)
    idx0 = d_best
    idxp = jnp.minimum(d_best + 1, nd - 1)
    idxm = jnp.maximum(d_best - 1, 0)
    pi0 = pip = pim = None
    for di, (ack, a, b, bck) in enumerate(EDGE_DIRECTIONS):
        eva = lshift(EW_a, "ewa", a[0])
        evb = lshift(EW_b, "ewb", b[0])
        val = tdiv(eva * 2 + evb, 3)
        if pi0 is None:
            pi0 = pip = pim = val
        else:
            pi0 = jnp.where(idx0 == di, val, pi0)
            pip = jnp.where(idxp == di, val, pip)
            pim = jnp.where(idxm == di, val, pim)
    out_ref[...] = tdiv(2 * pi0 + pip + pim, 4)


def _lane(a, dx, xx, w):
    if dx == 0:
        return a
    v = pltpu.roll(a, (-dx) % a.shape[-1], axis=1)
    return jnp.where((xx + dx >= 0) & (xx + dx < w), v, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def edge_pick(evgray, EW_a, EW_b, s, restricted, h: int, w: int,
              interpret: bool = False):
    """Picked EV-index plane for one frame; drop-in for edge_pick_xla."""
    chunk = CORE + 2 * APRON
    n_chunks = -(-h // CORE)
    hp = n_chunks * CORE + 2 * APRON
    pad = ((APRON, hp - h - APRON), (0, 0))

    def prep(x):
        return jnp.pad(x.astype(jnp.int32), pad)

    eg, ea, eb = prep(evgray), prep(EW_a), prep(EW_b)
    rs = prep(restricted)
    s_col = jnp.pad(s.astype(jnp.int32)[:, None], pad)

    call = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((chunk, w), lambda: (0, 0))] * 3
        + [pl.BlockSpec((chunk, 1), lambda: (0, 0)),
           pl.BlockSpec((chunk, w), lambda: (0, 0))],
        out_specs=pl.BlockSpec((chunk, w), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((chunk, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    outs = []
    for c in range(n_chunks):
        lo = c * CORE
        y0 = jnp.array([lo - APRON], jnp.int32)
        res = call(y0, eg[lo : lo + chunk], ea[lo : lo + chunk],
                   eb[lo : lo + chunk], s_col[lo : lo + chunk],
                   rs[lo : lo + chunk])
        keep = min(CORE, h - c * CORE)
        outs.append(res[APRON : APRON + keep])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
