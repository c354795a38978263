"""Interleaved-grid pattern-noise blur: all four Bayer channels in one pass.

The channel-split formulation (ops/patternnoise.py + patternnoise_pallas)
pays ~2.7 ms/frame of strided (2,2) deinterleave slices and reshape
reassembly around the blur. Here the edge-aware median blur runs directly
on the interleaved Bayer rows: every pixel computes its own channel's
median — channel-space window offset d is lane offset 2d, the per-cell
green average is broadcast to the cell's four pixels with parity rolls,
and the value plane V = (is_green ? p : p - avg) makes ONE masked median
produce mg1/mg2/mrg/mbg simultaneously. Output is the smoothed frame in
place: rs/bs = med + cell-mean-of-green-medians at r/b sites, g medians at
g sites.

Bit-equivalence with the split formulation (and hence the reference C,
patternnoise.c:88-180) is gated in tests/test_parity_patternnoise.py:
the arithmetic is identical — only the iteration geometry changes. The
single bisection spans the wider rg/bg domain (19 passes) for all
channels; the answer is unchanged (any bounds containing the values give
the same exact median).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRENGTH = 25
_THR = 500
_SENTINEL = 1 << 30
_BIG = 10**9
R_SUB = 32  # interleaved rows per block (must be even and 8-divisible)
APRON = 2  # one cell of rows above/below for the cell-broadcast rolls


def _batcher_pairs(n: int):
    """Batcher odd-even mergesort compare-exchange pairs for n entries.

    Generated for the next power of two, then filtered to pairs with both
    indices < n. Every CE in this network is ascending (min to the lower
    index), so virtual entries at indices >= n hold +sentinel forever —
    a CE touching one is a provable no-op (min leaves the finite value in
    place, max keeps the sentinel) and is dropped. (A bitonic network
    could NOT be pruned this way: its descending half-blocks move
    sentinels into low indices.)
    """
    p = 1
    while p < n:
        p *= 2
    pairs = []

    def ce(a, b):
        if a < n and b < n:
            pairs.append((a, b))

    def merge(lo, length, r):
        step = r * 2
        if step < length:
            merge(lo, length, step)
            merge(lo + r, length, step)
            for i in range(lo + r, lo + length - r, step):
                ce(i, i + r)
        else:
            ce(lo, lo + r)

    def sort(lo, length):
        if length > 1:
            m = length // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, length, 1)

    sort(0, p)
    return pairs


_SORT_PAIRS = _batcher_pairs(2 * _STRENGTH)


def _median_sortnet(entries, k):
    """Exact k-th smallest (0-indexed) of the masked window entries via a
    bitonic sorting network + rank walk.

    ``entries`` is a list of same-shape int32 arrays with invalid slots
    pre-set to the +sentinel (so they sort to the top and never displace a
    valid value below rank ``num``). Same result as the value-range
    bisection — both are the exact order statistic — at roughly half the
    vector-op count (~2 ops x ~450 CEs + 49 rank selects vs ~100 ops x 19
    bisection passes)."""
    s = list(entries)
    for a, b in _SORT_PAIRS:
        lo = jnp.minimum(s[a], s[b])
        hi = jnp.maximum(s[a], s[b])
        s[a], s[b] = lo, hi
    acc = s[0]
    for i in range(1, len(s)):
        acc = jnp.where(k >= i, s[i], acc)
    return acc


def _use_sortnet() -> bool:
    return os.environ.get("MLVFS_TPU_PN_MEDIAN", "sort") == "sort"


def _wirth_k(num):
    return jnp.where((num & 1) == 1, num // 2, num // 2 - 1)


def _kernel(y0_ref, img_ref, out_ref, *, h: int, w: int):
    a = img_ref[...].astype(jnp.int32)  # (rp, w) interleaved Bayer rows
    rp = a.shape[0]
    y0 = y0_ref[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    y_odd = (yy & 1) == 1
    x_odd = (xx & 1) == 1
    is_g = y_odd != x_odd  # green sites on the RGGB grid

    def rollr(v, dy):
        return pltpu.roll(v, (-dy) % rp, axis=0) if dy else v

    def rollx(v, dx, fill):
        if dx == 0:
            return v
        out = pltpu.roll(v, (-dx) % w, axis=1)
        return jnp.where((xx + dx >= 0) & (xx + dx < w), out, fill)

    # cell-broadcast green average: each pixel reads its cell's g1 (even row,
    # odd col) and g2 (odd row, even col) via parity-selected rolls
    def cell_broadcast(src, par_y, par_x):
        """Cell member with parities (par_y, par_x), broadcast to all four
        pixels of its 2x2 cell: target = src[y - (y&1) + par_y, x - (x&1)
        + par_x]."""
        up = rollr(src, -1)  # [y] <- src[y-1]
        down = rollr(src, 1)  # [y] <- src[y+1]
        row = jnp.where(
            y_odd,
            jnp.where(par_y == 1, src, up),
            jnp.where(par_y == 1, down, src),
        )
        left = rollx(row, -1, 0)  # [x] <- row[x-1]
        right = rollx(row, 1, 0)  # [x] <- row[x+1]
        return jnp.where(
            x_odd,
            jnp.where(par_x == 1, row, left),
            jnp.where(par_x == 1, right, row),
        )

    g1 = cell_broadcast(a, 0, 1)
    g2 = cell_broadcast(a, 1, 0)
    avg = (g1 + g2) // 2  # non-negative in-domain → trunc == floor

    V = jnp.where(is_g, a, a - avg)

    # validity window: prefix-AND of |avg[cell x+d] - avg[cell x]| <= THR,
    # channel-space offsets -25..24 → lane offsets 2d (patternnoise.c:123-144)
    ones = jnp.ones(a.shape, bool)
    win = {0: ones}
    acc = ones
    for d in range(1, _STRENGTH):
        acc = acc & (jnp.abs(rollx(avg, 2 * d, _BIG) - avg) <= _THR)
        win[d] = acc
    acc = ones
    for d in range(1, _STRENGTH + 1):
        acc = acc & (jnp.abs(rollx(avg, -2 * d, _BIG) - avg) <= _THR)
        win[-d] = acc

    offs = list(range(-_STRENGTH, _STRENGTH))
    win_stack = jnp.stack([win[d] for d in offs])
    num = jnp.sum(win_stack.astype(jnp.int32), axis=0)
    k = jnp.clip(_wirth_k(num), 0, len(offs) - 1)

    entries = [
        jnp.where(win[d], rollx(V, 2 * d, _SENTINEL), _SENTINEL) for d in offs
    ]
    if _use_sortnet():
        # exact k-th smallest via the pruned Batcher network + rank walk
        # (~900 vector ops vs ~2000 for the 19-pass bisection below)
        med = _median_sortnet(entries, k)
    else:
        stack = jnp.stack(entries)
        lov = jnp.full(a.shape, -(1 << 17), jnp.int32)
        hiv = jnp.full(a.shape, 1 << 17, jnp.int32)
        for _ in range(19):
            mid = (lov + hiv) >> 1
            cnt = jnp.sum((stack <= mid[None]).astype(jnp.int32), axis=0)
            take = cnt >= k + 1
            hiv = jnp.where(take, mid, hiv)
            lov = jnp.where(take, lov, mid + 1)
        med = lov  # per-pixel own-channel median (mg1/mg2 at g, mrg/mbg at r/b)

    # mg = (mg1 + mg2) // 2 per cell, added back at r/b sites
    mg1 = cell_broadcast(med, 0, 1)
    mg2 = cell_broadcast(med, 1, 0)
    # C floor semantics match the split form's `(mg1 + mg2) // 2`
    mg = (mg1 + mg2) // 2
    out_ref[...] = jnp.where(is_g, med, med + mg)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_interleaved(img, interpret: bool = False):
    """Smoothed interleaved frame for one (H, W) int32 Bayer image.

    Equivalent to deinterleave → edge_aware_blur → reinterleave of the
    split formulation (rs/g1s/g2s/bs at their Bayer sites)."""
    h, w = img.shape
    core = R_SUB
    n_chunks = -(-h // core)
    hp = n_chunks * core + 2 * APRON
    a_p = jnp.pad(img.astype(jnp.int32), ((APRON, hp - h - APRON), (0, 0)))
    chunk = core + 2 * APRON

    call = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, w), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, w), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((chunk, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    outs = []
    for c in range(n_chunks):
        lo = c * core
        y0 = jnp.array([lo - APRON], jnp.int32)
        res = call(y0, a_p[lo : lo + chunk])
        keep = min(core, h - lo)
        outs.append(res[APRON : APRON + keep])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------- column stage


def _shift2(arr, dy, dx):
    """out[y, x] = arr[y+dy, x+dx], zero-filled (XLA helper)."""
    h, w = arr.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(arr, ((py1, py0), (px1, px0)))
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (h, w))


def _hgrad_flat_interleaved(a, h, w):
    """Channel-flat gradient in[i-2]-in[i+2] on the interleaved grid,
    including the reference's row-wrap at channel-row boundaries
    (patternnoise.c:78-86): channel element i-2 is lane x-4, or
    (y-2, x+w-4) when the read crosses the row start."""
    xx = jnp.arange(w)[None, :]
    yy = jnp.arange(h)[:, None]
    a_m = jnp.where(xx >= 4, _shift2(a, 0, -4), _shift2(a, -2, w - 4))
    a_p = jnp.where(xx < w - 4, _shift2(a, 0, 4), _shift2(a, 2, -(w - 4)))
    g = a_m - a_p
    w2 = w // 2
    fi = (yy >> 1) * w2 + (xx >> 1)
    size = (h // 2) * w2
    return jnp.where((fi >= 2) & (fi < size - 2), g, 0)


def _wirth_k_j(num):
    return jnp.where((num & 1) == 1, num // 2, num // 2 - 1)


def fix_column_noise_interleaved(orig, denoised, white, h, w):
    """Interleaved-grid equivalent of patternnoise._fix_column_noise run on
    all four channels at once (patternnoise.c:185-282 semantics)."""
    import math as _math

    noise = orig - denoised
    hgrad = jnp.abs(_hgrad_flat_interleaved(orig, h, w))
    valid = ~((hgrad > 500) | (orig >= white))

    yy = jnp.arange(h)[:, None]
    rows_even = (yy & 1) == 0
    lo0, hi0 = -(1 << 18), 1 << 18
    iters = int(_math.ceil(_math.log2(hi0 - lo0 + 1)))
    h2 = h // 2

    # Both row-parity medians bisect together: one read of the sentinel-
    # folded noise per iteration (a parity-selected mid plane + two masked
    # counts) instead of a separate iters-pass loop per parity — halves the
    # stage's HBM traffic. Counts match the per-parity loops exactly: the
    # off-parity rows the old loops folded to _SENTINEL (never <= mid) are
    # excluded here by the same parity mask.
    nv = jnp.where(valid, noise, _SENTINEL)
    num = jnp.stack(
        [
            jnp.sum((valid & rows_even).astype(jnp.int32), axis=0),
            jnp.sum((valid & ~rows_even).astype(jnp.int32), axis=0),
        ]
    )  # (2, w)
    k = jnp.clip(_wirth_k_j(num), 0, h2 - 1)
    lov = jnp.full((2, w), lo0, jnp.int32)
    hiv = jnp.full((2, w), hi0, jnp.int32)
    for _ in range(iters):
        mid = (lov + hiv) >> 1
        mid_full = jnp.where(rows_even, mid[0][None, :], mid[1][None, :])
        le = nv <= mid_full
        cnt = jnp.stack(
            [
                jnp.sum((le & rows_even).astype(jnp.int32), axis=0),
                jnp.sum((le & ~rows_even).astype(jnp.int32), axis=0),
            ]
        )
        take = cnt >= k + 1
        hiv = jnp.where(take, mid, hiv)
        lov = jnp.where(take, lov, mid + 1)
    offsets = jnp.where(num < 10, 0, -lov)  # (2, w): per (row parity, lane)
    off_full = jnp.where(rows_even, offsets[0][None, :], offsets[1][None, :])
    applied = jnp.clip(orig + off_full, -32767, 32767)

    # per-channel median of the channel's column offsets (the global-cast
    # removal, patternnoise.c:268-279)
    w2 = w // 2
    mcs = {}
    for p in (0, 1):
        for xp in (0, 1):
            ch = offsets[p, xp::2]
            mcs[(p, xp)] = jnp.sort(ch)[(w2 // 2) if (w2 % 2) else (w2 // 2 - 1)]
    xx = jnp.arange(w)[None, :]
    x_odd = (xx & 1) == 1
    mc_even_rows = jnp.where(x_odd, mcs[(0, 1)], mcs[(0, 0)])
    mc_odd_rows = jnp.where(x_odd, mcs[(1, 1)], mcs[(1, 0)])
    mc_full = jnp.where(rows_even, mc_even_rows, mc_odd_rows)
    return jnp.clip(applied - mc_full, 0, 32760)


def fix_pattern_noise_direction(raw, white, interpret: bool = False):
    """One direction over the interleaved Bayer frame — drop-in for
    patternnoise._fix_column_noise_rggb (even dimensions only)."""
    h, w = raw.shape
    den = blur_interleaved(raw, interpret=interpret)
    return fix_column_noise_interleaved(raw.astype(jnp.int32), den, white, h, w)
