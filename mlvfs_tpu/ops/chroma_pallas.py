"""VMEM-resident Pallas kernel for chroma smoothing (2x2/3x3/5x5).

The XLA formulation (ops/chroma_smooth.py) is already gather-free, but its
~30 cell-plane slices, the K-wide sort, and the write-back interleave run
as HBM-resident passes (~2.5-4.6 ms/frame fused). Here each row chunk
computes everything per pixel on the interleaved Bayer grid in VMEM:

  * the EV transform (ops/evarith.py double-single arithmetic — pure IEEE
    add/mul/div, so it runs inside the kernel) maps the chunk once;
  * each pixel's own-cell green mean and chroma diff Q come from parity
    cell-broadcast rolls (same trick as patternnoise_fused);
  * the neighborhood median is a Devillard median-selection network over
    the K stride-2 rolled Q planes (K = 5/9/25, ops/medians.py) — the
    K//2-order statistic equals jnp.sort's (proven exhaustively in
    tests/test_medians.py), so results are bit-identical to the XLA form
    (gated in tests/test_parity_ops.py);
  * the inverse EV transform runs once on the combined (ge + d) plane.

Semantics preserved bit for bit: C truncating div-by-2, INT_MIN wrap at
black pixels, the template's cell window [4, w-4) x [4, h-5), and the
dark-cell / negative-result skip rules (chroma_smooth.c:22-71).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .luts import EV_RESOLUTION
from . import evarith
from .chroma_smooth import _offsets

import numpy as np

# 216 = 5 chunks at 1080p: the r3 sweep (tools/profile_cs_rsub.py and the
# post-roll-factoring re-sweep) measures monotone gains to here — ms/frame
# at 1080p B=8 for RSUB 32/64/128/216: cs2x2 .60/.48/.45/.43, cs3x3
# .54/.48/.48/.45, cs5x5 .74/.66/.64/.63; 540 fails to compile cs5x5
# (VMEM), so 216 is the largest safe default. 8-multiple keeps sublane
# alignment; chunk apron recompute shrinks with chunk count.
R_SUB = int(os.environ.get("MLVFS_TPU_CS_RSUB", "216"))
# default on: measured cs2x2 0.89 -> 0.50 ms/frame (Mosaic generates the
# double-single EV chain ~2x slower inside the method-2 kernel than XLA
# does frame-wide), cs3x3/cs5x5 unchanged (saved apron recompute offsets
# the extra HBM stream)
EV_PRECOMPUTE = os.environ.get("MLVFS_TPU_CS_EVPRE", "1") == "1"
APRON = 8  # neighbor reach 5 rows + cell rolls 1


def _median_k(planes, k_len):
    """k_len//2-order statistic of the k_len planes (value-identical to
    jnp.sort(stack)[k_len//2]). Devillard median-selection networks —
    7/19/99 compare-exchanges for K=5/9/25 versus the 24/80/240 of the
    power-of-two-padded bitonic sort this replaced; proven exact by the
    exhaustive 0-1 gate in tests/test_medians.py."""
    from .medians import median_planes

    assert len(planes) == k_len
    return median_planes(planes)


def _div2_trunc(t):
    return t // 2 + ((t & 1) != 0) * (t < 0)


def _kernel(y0_ref, img_ref, *rest, method: int, black: int, h: int, w: int, ev_in: bool):
    if ev_in:
        ev_ref, out_ref = rest
    else:
        (out_ref,) = rest
    src = img_ref[...].astype(jnp.int32)
    rp = src.shape[0]
    y0 = y0_ref[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, src.shape, 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, src.shape, 1)
    y_odd = (yy & 1) == 1
    x_odd = (xx & 1) == 1

    # the EV transform is the kernel's dominant op count; EV_PRECOMPUTE
    # evaluates it once per frame in XLA (no apron recompute) and streams
    # it in as a second block — same evarith function, bit-identical
    E = ev_ref[...] if ev_in else evarith.raw2ev16(src, black)

    def rollr(v, dy):
        return pltpu.roll(v, (-dy) % rp, axis=0) if dy else v

    def rollx(v, dx, fill):
        if dx == 0:
            return v
        out = pltpu.roll(v, (-dx) % w, axis=1)
        return jnp.where((xx + dx >= 0) & (xx + dx < w), out, fill)

    def roll2(v, dy, dx, fill=0):
        return rollx(rollr(v, dy), dx, fill)

    def cell_broadcast(v, par_y, par_x):
        up = rollr(v, -1)
        down = rollr(v, 1)
        row = jnp.where(
            y_odd,
            jnp.where(par_y == 1, v, up),
            jnp.where(par_y == 1, down, v),
        )
        left = rollx(row, -1, 0)
        right = rollx(row, 1, 0)
        return jnp.where(
            x_odd,
            jnp.where(par_x == 1, row, left),
            jnp.where(par_x == 1, right, row),
        )

    # own-cell green EV mean (the template's ge, per cell, truncating div)
    Eg1 = cell_broadcast(E, 0, 1)
    Eg2 = cell_broadcast(E, 1, 0)
    ge = _div2_trunc(Eg1 + Eg2)

    # per-pixel chroma diff vs its own cell's green mean (r-gen at r sites,
    # b-gen at b sites; value at green sites is never consumed)
    Q = E - ge

    # factor the lane rolls: the offsets form a grid, so the 9/25 roll2 calls
    # share only 3/5 distinct lane shifts — roll x once per column, then the
    # (cheaper) sublane rolls per row. Order swap is exact: the axes are
    # independent and the x-boundary mask is row-invariant.
    offs = _offsets(method)
    q_by_dx = {i: rollx(Q, i, 0) for i in sorted({i for (i, _) in offs})}
    stack = [rollr(q_by_dx[i], j) for (i, j) in offs]
    d = _median_k(stack, len(offs))

    # the skip rule is per CELL and uses BOTH medians (template:35,64-65):
    # broadcast the cell's r-site and b-site medians to all its pixels
    d_r = cell_broadcast(d, 0, 0)
    d_b = cell_broadcast(d, 1, 1)
    ok = ge >= 2 * EV_RESOLUTION
    ok &= ge + d_r > EV_RESOLUTION
    ok &= ge + d_b > EV_RESOLUTION
    e_out = jnp.clip(ge + d, 0, 14 * EV_RESOLUTION - 1)
    new_val = evarith.ev2raw16_pos(e_out) + black

    # cell window: cells (cy, cx) with top-left (4+2cy, 4+2cx), cy < ny,
    # cx < nx (chroma_smooth.c:26-28); r site = cell top-left, b site = +1,+1
    nx = max(0, (w - 4 - 4 + 1) // 2)
    ny = max(0, (h - 5 - 4 + 1) // 2)
    in_cells = (yy >= 4) & (yy < 4 + 2 * ny) & (xx >= 4) & (xx < 4 + 2 * nx)
    is_rb = y_odd == x_odd  # r (even,even) and b (odd,odd) sites
    write = in_cells & is_rb & ok
    out_ref[...] = jnp.where(write, new_val, src)


@functools.partial(jax.jit, static_argnames=("method", "black", "interpret"))
def chroma_smooth_pallas(img, method: int, black: int, interpret: bool = False):
    """One (H, W) frame; drop-in for chroma_smooth_image (uint16 domain)."""
    h, w = img.shape
    core = R_SUB
    n_chunks = -(-h // core)
    hp = n_chunks * core + 2 * APRON
    a_p = jnp.pad(img.astype(jnp.int32), ((APRON, hp - h - APRON), (0, 0)))
    chunk = core + 2 * APRON
    ev_in = EV_PRECOMPUTE
    if ev_in:
        # pad AFTER the transform: raw2ev16(0, black) == 0 for black > 0,
        # so zero-padding E equals transforming the zero-padded image
        e_p = jnp.pad(evarith.raw2ev16(img.astype(jnp.int32), black),
                      ((APRON, hp - h - APRON), (0, 0)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((chunk, w), lambda: (0, 0)),
    ]
    if ev_in:
        in_specs.append(pl.BlockSpec((chunk, w), lambda: (0, 0)))
    call = pl.pallas_call(
        functools.partial(_kernel, method=method, black=int(black), h=h, w=w, ev_in=ev_in),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, w), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((chunk, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    outs = []
    for c in range(n_chunks):
        lo = c * core
        y0 = jnp.array([lo - APRON], jnp.int32)
        args = (y0, a_p[lo : lo + chunk]) + ((e_p[lo : lo + chunk],) if ev_in else ())
        res = call(*args)
        keep = min(core, h - lo)
        outs.append(res[APRON : APRON + keep])
    full = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return full.astype(img.dtype)
