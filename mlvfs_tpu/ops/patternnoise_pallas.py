"""Pallas TPU kernel for pattern noise's edge-aware median blur.

The XLA formulation (ops/patternnoise.py `_edge_aware_blur`) materializes a
(50, H/2, W/2) neighbor stack per channel in HBM and re-reads it on every
bisection pass — ~14 GB of HBM traffic per 1080p frame, which put the op at
~41 ms/frame. Here each grid step holds one row block of all four channels
in VMEM, builds the 50-offset neighbor stacks and the prefix-AND validity
window in registers/VMEM, and runs the exact value-range bisection without
ever writing the stacks to HBM: traffic drops to one read + one write of
the four channel planes.

Semantics are identical to `_edge_aware_blur` (itself bit-exact vs
horizontal_edge_aware_blur_rggb, patternnoise.c:88-180): same window
construction (inclusive x-25 .. x+24, prefix-AND of |avg[x+k]-avg[x]|<=500,
patternnoise.c:123-144), same Wirth median index, same integer arithmetic.
Equivalence is gated by tests/test_parity_patternnoise.py.

Rows are independent (the blur is horizontal), so the grid tiles rows;
lane shifts use pltpu.roll with an iota edge mask (shifted-out positions
get a sentinel that the window mask excludes / the threshold rejects).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRENGTH = 25
_THR = 500
_SENTINEL = 1 << 30
_BIG = 10**9
R_SUB = 32  # rows per block (second-minor dim must be 8-divisible); larger
#             blocks amortize grid-step overhead — peak VMEM is the window
#             stack plus one value stack (~13 MB at 2.5K width)


def _wirth_k(num):
    return jnp.where((num & 1) == 1, num // 2, num // 2 - 1)


def _roll_lanes(a, dx):
    """out[..., x] = a[..., x+dx] (circular on the lane axis)."""
    if dx == 0:
        return a
    n = a.shape[-1]
    return pltpu.roll(a, (-dx) % n, axis=a.ndim - 1)


def _bisect(stack, k, lo: int, hi: int, iters: int):
    """Smallest v with count(stack<=v) >= k+1 over the masked stack — exact.

    The stack arrives with invalid entries pre-set to a sentinel above
    ``hi`` (folding the window mask in once removes a third of the ops in
    every bisection pass)."""
    shape = k.shape
    lov = jnp.full(shape, lo, jnp.int32)
    hiv = jnp.full(shape, hi, jnp.int32)
    for _ in range(iters):
        mid = (lov + hiv) >> 1
        cnt = jnp.sum((stack <= mid[None]).astype(jnp.int32), axis=0)
        take = cnt >= k + 1
        hiv = jnp.where(take, mid, hiv)
        lov = jnp.where(take, lov, mid + 1)
    return lov


def _blur_kernel(r_ref, g1_ref, g2_ref, b_ref, rs_ref, g1s_ref, g2s_ref, bs_ref, *, w2: int):
    r = r_ref[0].astype(jnp.int32)
    g1 = g1_ref[0].astype(jnp.int32)
    g2 = g2_ref[0].astype(jnp.int32)
    b = b_ref[0].astype(jnp.int32)
    avg = (g1 + g2) // 2  # non-negative in-domain → trunc == floor
    rg = r - avg
    bg = b - avg

    col = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)

    def shifted(a, d, fill):
        out = _roll_lanes(a, d)
        ok = (col + d >= 0) & (col + d < w2)
        return jnp.where(ok, out, fill)

    # validity window: prefix-AND of |avg[x+k]-avg[x]| <= THR away from the
    # center, offsets -25..24 (patternnoise.c:123-144)
    ones = jnp.ones(r.shape, bool)
    win = {0: ones}
    acc = ones
    for d in range(1, _STRENGTH):
        acc = acc & (jnp.abs(shifted(avg, d, _BIG) - avg) <= _THR)
        win[d] = acc
    acc = ones
    for d in range(1, _STRENGTH + 1):
        acc = acc & (jnp.abs(shifted(avg, -d, _BIG) - avg) <= _THR)
        win[-d] = acc

    offs = list(range(-_STRENGTH, _STRENGTH))
    win_stack = jnp.stack([win[d] for d in offs])
    num = jnp.sum(win_stack.astype(jnp.int32), axis=0)
    k = jnp.clip(_wirth_k(num), 0, len(offs) - 1)

    def med(chan, lo, hi, iters):
        stack = jnp.stack(
            [
                jnp.where(win[d], shifted(chan, d, _SENTINEL), _SENTINEL)
                for d in offs
            ]
        )
        return _bisect(stack, k, lo, hi, iters)

    # value domains: g channels are int16 pixels, rg/bg are pixel-minus-avg
    # diffs; bounds only need to contain the domain for the median to be exact
    mg1 = med(g1, -(1 << 15), 1 << 15, 17)
    mg2 = med(g2, -(1 << 15), 1 << 15, 17)
    mg = (mg1 + mg2) // 2
    mrg = med(rg, -(1 << 17), 1 << 17, 19)
    mbg = med(bg, -(1 << 17), 1 << 17, 19)

    rs_ref[0] = mrg + mg
    g1s_ref[0] = mg1
    g2s_ref[0] = mg2
    bs_ref[0] = mbg + mg


@functools.partial(jax.jit, static_argnames=("interpret",))
def edge_aware_blur_pallas(r, g1, g2, b, interpret: bool = False):
    """Smoothed (rs, g1s, g2s, bs) for one frame's four (H/2, W/2) channels.

    Drop-in replacement for patternnoise._edge_aware_blur.
    """
    h2, w2 = r.shape
    hp = -(-h2 // R_SUB) * R_SUB
    pad = ((0, hp - h2), (0, 0))

    def prep(x):
        return jnp.pad(x.astype(jnp.int32), pad)[None]

    grid = (hp // R_SUB,)
    spec = pl.BlockSpec((1, R_SUB, w2), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((1, hp, w2), jnp.int32)
    rs, g1s, g2s, bs = pl.pallas_call(
        functools.partial(_blur_kernel, w2=w2),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 4,
        out_shape=[out_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prep(r), prep(g1), prep(g2), prep(b))
    return tuple(x[0, :h2] for x in (rs, g1s, g2s, bs))
