"""Pallas TPU kernels for AMaZE's three in-place raster passes.

The reference's raster passes (hvwt/pmwt neighbor refinement
amaze_demosaic_RT.c:1054-1058/1280-1281, Nyquist dilation :998-1010,
chrominance smoothing :1386-1398) update each row from already-updated
rows above and original rows below — a sequential chain over rows. The
XLA formulation in amaze_core runs them as lax.scan over 160-row tile
chunks; on a real chip those scans are ~half the amaze-edge cost
(~7.7 of 15.2 ms/frame at 1280x960) because every step is a separate
small device dispatch with HBM-resident carries.

Here each pass is one Pallas kernel: the 160-row tile group sits in VMEM,
the row chain is a fori_loop mutating the output block in place (rows
below the cursor still hold original values — exactly the reference's
in-place raster semantics), and lane shifts replace jnp.roll. Tile
restarts match the reference grid (SCAN_TILE/SCAN_STEP from amaze_core),
so results are numerically equivalent to the chunked XLA scans; the
equivalence is gated by tests/test_amaze_scans_pallas.py.

Layout: tiles are stacked on the sublane axis — blocks are
(SCAN_TILE, T_SUB, wp) float32 with T_SUB tiles advancing per grid step,
so each row step computes on a full (T_SUB, wp) vector register tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import amaze_core as core

SCAN_TILE = core.SCAN_TILE
# Tiles per block (sublane axis). Mosaic requires the block's second-minor
# dim be 8-divisible, so T_SUB is fixed at 8; VMEM per (SCAN_TILE, 8, wpp)
# f32 block is ~6.9 MB at 1080p — two blocks (in+out) per kernel fit the
# 16 MB scoped limit, which is why the chroma pass runs as two independent
# single-plane calls rather than one four-block call.
T_SUB = 8
WRAP = 8  # wrap-copy lanes each side (scans read |dx| <= 3; downstream
#           stencil stages read scanned planes with |dx| up to 8)

# Every scan kernel holds (SCAN_TILE, T_SUB, wpp) f32 in+out blocks in VMEM
# — ~42 MB with double buffering at 1920-wide frames (wpp=2048), above the
# 16 MB default scoped-vmem limit (1080p dual-ISO amaze-edge failed to
# compile on v5e without this; ~56 MB kernels are known-fine on v5e).
_SCAN_VMEM = pltpu.CompilerParams(vmem_limit_bytes=80 * 1024 * 1024)


def _pad_tiles(x_tiles: jnp.ndarray):
    """(T, SCAN_TILE, wp) → (SCAN_TILE, Tp, wpp) with T padded to a T_SUB
    multiple and wp padded to a lane multiple.

    The first/last 3 lanes of the pad hold the frame's wrap-around copies so
    that |dx| <= 3 lane rolls reproduce the XLA scans' jnp.roll wrapping at
    the frame edges exactly (the wrapped-in values sit in the 16-pixel apron
    either way, but exactness keeps the Pallas/XLA equivalence gate strict).
    """
    T, tile, wp = x_tiles.shape
    Tp = -(-T // T_SUB) * T_SUB
    wpp = -(-wp // 128) * 128
    if 0 < wpp - wp < 2 * WRAP:
        wpp += 128
    x = jnp.pad(x_tiles, ((0, Tp - T), (0, 0), (0, wpp - wp)))
    if wpp > wp:
        x = x.at[..., wp : wp + WRAP].set(x[..., 0:WRAP])
        x = x.at[..., wpp - WRAP :].set(x[..., wp - WRAP : wp])
    return x.transpose(1, 0, 2), T, wp


def _roll(a, shift, axis):
    """pltpu.roll with negative shifts mapped to their positive equivalent
    (the primitive rejects shift < 0)."""
    n = a.shape[axis]
    return pltpu.roll(a, shift % n, axis=axis)


def _shift(a, dx):
    """out[..., x] = a[..., x+dx] (circular, lane axis)."""
    if dx == 0:
        return a
    return _roll(a, -dx, a.ndim - 1)


def _fix_wrap(a, wp):
    """Re-establish the wrap-copy invariant on a computed row: pad lanes
    [wp, wp+WRAP) hold lanes [0, WRAP) and the last WRAP lanes hold
    [wp-WRAP, wp), so subsequent small rolls that read this (updated) row
    reproduce the XLA scans' wrapping at the true frame width."""
    wpp = a.shape[-1]
    if wpp == wp:
        return a
    xs = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], a.ndim - 1)
    left_copy = _roll(a, wp, a.ndim - 1)          # a[x - wp]
    right_copy = _roll(a, wpp - wp, a.ndim - 1)   # a[x - (wpp - wp)]
    a = jnp.where((xs >= wp) & (xs < wp + WRAP), left_copy, a)
    a = jnp.where(xs >= wpp - WRAP, right_copy, a)
    return a


def _site_mask(wpp, parity):
    """(1, wpp) mask of lanes whose x parity == parity (traced scalar)."""
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, wpp), 1)
    return (xs % 2) == parity


def _replicate_cells(vals, parity, wpp):
    """Per-2-lane-cell replication of the site lane (the reference's
    indx>>1 arrays): out[x] = vals[x] at site lanes, vals[site_of_cell]
    elsewhere. parity = r % 2 (a static int) selects the site lane of each
    cell; rows are processed in pairs so parity is compile-time constant
    and only one roll is materialized."""
    site = _site_mask(wpp, parity)
    # non-site lane x gets its cell's site value: for parity 0 that is
    # x-1 (shift right), for parity 1 it is x+1 (shift left)
    other = _roll(vals, 1 if parity == 0 else -1, vals.ndim - 1)
    return jnp.where(site, vals, other)


# ---------------------------------------------------------------------------
# neighbor refinement (amaze:1054-1058, :1280-1281)


def _refine_kernel(in_ref, out_ref, *, wp):
    out_ref[:] = in_ref[:]

    def one(r, parity):
        old = out_ref[r]                      # (T_SUB, wpp) original row r
        # updated row r-1; the XLA scan seeds its carry with original row 0,
        # so r=0 reads row 0 itself
        prev = out_ref[jnp.maximum(r - 1, 0)]
        nxt_idx = jnp.minimum(r + 1, SCAN_TILE - 1)
        nxt = in_ref[nxt_idx]                 # original row r+1
        nxt = jnp.where(r + 1 <= SCAN_TILE - 1, nxt, 0.0)
        alt = 0.25 * (
            _roll(prev, 1, 1) + _roll(prev, -1, 1)
            + _roll(nxt, 1, 1) + _roll(nxt, -1, 1)
        )
        new = jnp.where(jnp.abs(0.5 - old) < jnp.abs(0.5 - alt), alt, old)
        new = _replicate_cells(new, parity, new.shape[-1])
        out_ref[r] = _fix_wrap(new, wp)

    def pair(i, _):
        # row pairs keep the Bayer parity compile-time static
        one(2 * i, 0)
        one(2 * i + 1, 1)
        return 0

    jax.lax.fori_loop(0, SCAN_TILE // 2, pair, 0)


def refine_pallas(wt: jnp.ndarray, hp: int, wp: int, interpret: bool = False):
    """Drop-in equivalent of amaze_core._neighbor_refine_scan."""
    T = core._n_tiles(hp)
    tiles = core._chunk_rows(wt, T)           # (T, 160, wp)
    x, T0, wp0 = _pad_tiles(tiles)            # (160, Tp, wpp)
    Tp, wpp = x.shape[1], x.shape[2]
    spec = pl.BlockSpec((SCAN_TILE, T_SUB, wpp), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_refine_kernel, wp=wp0),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(Tp // T_SUB,),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=_SCAN_VMEM,  # wpp=2048 blocks exceed the 16 MB default
        interpret=interpret,
    )(x)
    out = out.transpose(1, 0, 2)[:T0, :, :wp0]
    return core._unchunk_rows(out, hp)


# ---------------------------------------------------------------------------
# Nyquist dilation (amaze:998-1010)


def _dilate_kernel(in_ref, out_ref, *, wp):
    out_ref[:] = in_ref[:]
    wpp = out_ref.shape[-1]
    xs_lane = jax.lax.broadcasted_iota(jnp.int32, (out_ref.shape[1], wpp), 1)

    def one(r, parity):
        o = in_ref[r].astype(jnp.int32)
        r1 = jnp.where(r >= 1, out_ref[jnp.maximum(r - 1, 0)], 0.0).astype(jnp.int32)
        r2 = jnp.where(r >= 2, out_ref[jnp.maximum(r - 2, 0)], 0.0).astype(jnp.int32)
        d1 = jnp.where(r + 1 < SCAN_TILE, in_ref[jnp.minimum(r + 1, SCAN_TILE - 1)], 0.0).astype(jnp.int32)
        d2 = jnp.where(r + 2 < SCAN_TILE, in_ref[jnp.minimum(r + 2, SCAN_TILE - 1)], 0.0).astype(jnp.int32)
        K = (
            r2
            + _roll(r1, 1, 1) + _roll(r1, -1, 1)
            + o + _roll(o, -2, 1)
            + _roll(d1, 1, 1) + _roll(d1, -1, 1)
            + d2
        )
        # per-cell transfer function on new[x-2]: temp = a + K,
        # >4 → 1, <4 → 0, ==4 → keep original (amaze:1005-1008)
        f0 = jnp.where(K > 4, 1, jnp.where(K < 4, 0, o))
        f1 = jnp.where(K + 1 > 4, 1, jnp.where(K + 1 < 4, 0, o))
        # keep only site lanes, replicate across the cell so lane shifts of
        # 2*step compose cells
        f0 = _replicate_cells(jnp.where(_site_mask(wpp, parity), f0, 0), parity, wpp)
        f1 = _replicate_cells(jnp.where(_site_mask(wpp, parity), f1, 0), parity, wpp)

        # prefix-compose transfer functions left-to-right (doubling):
        # identity (f0,f1)=(0,1) shifts in from beyond the row start
        shift = 2
        while shift < wpp:
            g0 = _roll(f0, shift, 1)
            g1 = _roll(f1, shift, 1)
            edge = xs_lane < shift
            g0 = jnp.where(edge, 0, g0)
            g1 = jnp.where(edge, 1, g1)
            # compose: (g then f)(a) = f(g(a))
            f0, f1 = (
                jnp.where(g0 == 0, f0, f1),
                jnp.where(g1 == 0, f0, f1),
            )
            shift *= 2
        new = f0.astype(in_ref.dtype)  # chain seeded with a = 0 at tile left
        out_ref[r] = _fix_wrap(new, wp)

    def pair(i, _):
        # row pairs keep the Bayer parity compile-time static
        one(2 * i, 0)
        one(2 * i + 1, 1)
        return 0

    jax.lax.fori_loop(0, SCAN_TILE // 2, pair, 0)


def dilate_pallas(nyq: jnp.ndarray, hp: int, wp: int, interpret: bool = False):
    """Drop-in equivalent of amaze_core._nyquist_dilate."""
    T = core._n_tiles(hp)
    tiles = core._chunk_rows(nyq, T).astype(jnp.float32)
    x, T0, wp0 = _pad_tiles(tiles)
    Tp, wpp = x.shape[1], x.shape[2]
    spec = pl.BlockSpec((SCAN_TILE, T_SUB, wpp), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dilate_kernel, wp=wp0),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(Tp // T_SUB,),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=_SCAN_VMEM,  # wpp=2048 blocks exceed the 16 MB default
        interpret=interpret,
    )(x)
    out = out.transpose(1, 0, 2)[:T0, :, :wp0].astype(nyq.dtype)
    return core._unchunk_rows(out, hp)


# ---------------------------------------------------------------------------
# chrominance smoothing (amaze:1386-1398)

EPS = core.EPS


def _chroma_plane_kernel(in_ref, out_ref, *, wp, update_parity):
    """One chrominance plane. Rows whose padded parity == update_parity get
    the directional interpolation; the other rows keep their original values
    (plane 0 / G-R updates on B rows = odd parity, plane 1 / G-B on R rows =
    even parity, amaze:1386-1398). The two planes never read each other, so
    each runs as its own two-block call to stay inside the VMEM budget."""
    out_ref[:] = in_ref[:]

    def one(r, parity):
        def rd(p_ref, dy):
            idx = jnp.clip(r + dy, 0, SCAN_TILE - 1)
            ok = (r + dy >= 0) & (r + dy <= SCAN_TILE - 1)
            return jnp.where(ok, p_ref[idx], 0.0)

        # each needed row is read once; updated rows above come from
        # out_ref, original rows below from in_ref (in-place raster
        # semantics)
        um1 = rd(out_ref, -1)
        um3 = rd(out_ref, -3)
        ld1 = rd(in_ref, 1)
        ld3 = rd(in_ref, 3)
        nm1 = _shift(um1, -1)
        pp1 = _shift(um1, 1)
        nm3 = _shift(um3, -3)
        pp3 = _shift(um3, 3)
        om1 = _shift(ld1, 1)
        op1 = _shift(ld1, -1)
        om3 = _shift(ld3, 3)
        op3 = _shift(ld3, -3)
        wtnw = 1.0 / (EPS + jnp.abs(nm1 - om1) + jnp.abs(nm1 - nm3) + jnp.abs(om1 - nm3))
        wtne = 1.0 / (EPS + jnp.abs(pp1 - op1) + jnp.abs(pp1 - pp3) + jnp.abs(op1 - pp3))
        wtsw = 1.0 / (EPS + jnp.abs(op1 - pp1) + jnp.abs(op1 - om3) + jnp.abs(pp1 - op3))
        wtse = 1.0 / (EPS + jnp.abs(om1 - nm1) + jnp.abs(om1 - op3) + jnp.abs(nm1 - om3))
        val = (
            wtnw * (1.325 * nm1 - 0.175 * nm3
                    - 0.075 * _shift(um1, -3) - 0.075 * _shift(um3, -1))
            + wtne * (1.325 * pp1 - 0.175 * pp3
                      - 0.075 * _shift(um1, 3) - 0.075 * _shift(um3, 1))
            + wtsw * (1.325 * op1 - 0.175 * op3
                      - 0.075 * _shift(ld1, -3) - 0.075 * _shift(ld3, -1))
            + wtse * (1.325 * om1 - 0.175 * om3
                      - 0.075 * _shift(ld1, 3) - 0.075 * _shift(ld3, 1))
        ) / (wtnw + wtne + wtsw + wtse)

        wpp = val.shape[-1]
        out_ref[r] = _fix_wrap(_replicate_cells(val, parity, wpp), wp)

    def pair(i, _):
        # only rows of update_parity change; the other parity's rows keep
        # their original values (already copied into out_ref)
        one(2 * i + update_parity, update_parity)
        return 0

    jax.lax.fori_loop(0, SCAN_TILE // 2, pair, 0)


def _chroma_one(D, hp, wp, update_parity, interpret):
    T = core._n_tiles(hp)
    x, T0, wp0 = _pad_tiles(core._chunk_rows(D, T))
    Tp, wpp = x.shape[1], x.shape[2]
    spec = pl.BlockSpec((SCAN_TILE, T_SUB, wpp), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chroma_plane_kernel, wp=wp0,
                          update_parity=update_parity),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(Tp // T_SUB,),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=_SCAN_VMEM,  # wpp=2048 blocks exceed the 16 MB default
        interpret=interpret,
    )(x)
    return core._unchunk_rows(out.transpose(1, 0, 2)[:T0, :, :wp0], hp)


def chroma_pallas(D0: jnp.ndarray, D1: jnp.ndarray, hp: int, wp: int,
                  interpret: bool = False):
    """Drop-in equivalent of amaze_core._chroma_smooth_scan."""
    out0 = _chroma_one(D0, hp, wp, 1, interpret)  # G-R updates on B rows
    out1 = _chroma_one(D1, hp, wp, 0, interpret)  # G-B updates on R rows
    return out0, out1


# ---------------------------------------------------------------------------
# tile-layout entry points (split AMaZE pipeline: arrays already chunked as
# (T, SCAN_TILE, wpp) with wrap-copy pad lanes maintained by the producers)


def _to_scan_layout(x_tiles):
    T = x_tiles.shape[0]
    Tp = -(-T // T_SUB) * T_SUB
    x = jnp.pad(x_tiles, ((0, Tp - T), (0, 0), (0, 0)))
    return x.transpose(1, 0, 2), T


def _run_pass(kernel, x, interpret):
    Tp, wpp = x.shape[1], x.shape[2]
    spec = pl.BlockSpec((SCAN_TILE, T_SUB, wpp), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(Tp // T_SUB,),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=_SCAN_VMEM,
        interpret=interpret,
    )(x)


def refine_tiles(x_tiles, wp: int, interpret: bool = False):
    x, T = _to_scan_layout(x_tiles)
    out = _run_pass(functools.partial(_refine_kernel, wp=wp), x, interpret)
    return out.transpose(1, 0, 2)[:T]


def dilate_tiles(x_tiles, wp: int, interpret: bool = False):
    x, T = _to_scan_layout(x_tiles)
    out = _run_pass(functools.partial(_dilate_kernel, wp=wp), x, interpret)
    return out.transpose(1, 0, 2)[:T]


def chroma_one_tiles(x_tiles, wp: int, update_parity: int, interpret: bool = False):
    x, T = _to_scan_layout(x_tiles)
    out = _run_pass(
        functools.partial(_chroma_plane_kernel, wp=wp, update_parity=update_parity),
        x, interpret)
    return out.transpose(1, 0, 2)[:T]
