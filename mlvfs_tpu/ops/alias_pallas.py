"""Pallas TPU kernel for the dual-ISO alias-map filter chain.

build_alias_map's filter stages (hdr.c:1421-1486) — 6th-largest over a
37-tap diamond, an integer gaussian blur, and a per-2x2-cell max — are
pure stencils with radius <= 6. The XLA formulation runs them as ~120
shifted elementwise passes over HBM-resident frames (~1.2 ms/frame at
1280x960); here the whole chain runs on VMEM-resident row chunks: each
chunk is read once, all taps are pltpu.roll + mask in registers/VMEM,
and the chunk is written once.

Chunking: the frame is zero-padded by APRON rows top and bottom (zero
fill IS the XLA `_shift` out-of-frame semantics, so frame edges are
exact), then processed in fixed-shape overlapping chunks whose apron
outputs are discarded — cumulative stencil reach is 6 (top6) + 6 (blur)
+ 2 (cell pairing) = 14 < APRON. The absolute row offset arrives as an
SMEM scalar so every chunk shares one compiled kernel.

Equivalence with `dualiso_full._build_alias_map`'s filter stages is
gated bit-for-bit by tests/test_parity_dualiso_full.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

APRON = 16
CORE = 256  # rows of real output per chunk


def _offsets_tables():
    from .dualiso_full import _ALIAS_FILTER_OFFS, _ALIAS_BLUR_GROUPS, ALIAS_MAP_MAX

    return _ALIAS_FILTER_OFFS, _ALIAS_BLUR_GROUPS, ALIAS_MAP_MAX


def _kernel(y0_ref, alias_ref, skip_ref, out_ref, *, h: int, w: int):
    filter_offs, blur_groups, alias_map_max = _offsets_tables()
    a = alias_ref[...]
    skip = skip_ref[...] != 0
    rp = a.shape[0]
    y0 = y0_ref[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    inner = (yy >= 6) & (yy < h - 6) & (xx >= 6) & (xx < w - 6)

    rolled = {}

    def shift(src, tag, dy, dx):
        # out[y, x] = src[y+dy, x+dx], 0 outside the frame. Row reads resolve
        # inside the chunk (apron holds real/padded-zero rows); columns mask.
        key = (tag, dy, dx)
        v = rolled.get(key)
        if v is not None:
            return v
        v = src
        if dy:
            v = pltpu.roll(v, (-dy) % rp, axis=0)
        if dx:
            v = pltpu.roll(v, (-dx) % w, axis=1)
            v = jnp.where((xx + dx >= 0) & (xx + dx < w), v, 0)
        rolled[key] = v
        return v

    # 6th largest of the 37-tap diamond: running top-6 insertion
    NEG = jnp.int32(-(1 << 30))
    top = [jnp.full(a.shape, NEG, jnp.int32) for _ in range(6)]
    for (dx, dy) in filter_offs:
        v = shift(a, "a", dy, dx)
        for j in range(6):
            hi = jnp.maximum(top[j], v)
            v = jnp.minimum(top[j], v)
            top[j] = hi
    sel = inner & ~skip
    aux = jnp.where(sel, top[5], a)

    # integer gaussian blur with the reference's exact group arithmetic
    acc = aux
    for weight, offs in blur_groups:
        g = jnp.zeros_like(aux)
        for (dx, dy) in offs:
            g = g + shift(aux, "aux", dy, dx)
        acc = acc + g * weight // 1024
    blurred = jnp.where(sel, acc, a)

    # per-2x2-cell max over the cell grid starting at (2, 2)
    ny_c = len(range(2, h - 2, 2))
    nx_c = len(range(2, w - 2, 2))
    in_cells = (
        (yy >= 2) & (yy < 2 + 2 * ny_c) & (xx >= 2) & (xx < 2 + 2 * nx_c)
    )
    y_odd = ((yy - 2) & 1) == 1
    x_odd = ((xx - 2) & 1) == 1
    down = pltpu.roll(blurred, rp - 1, axis=0)  # [y] <- [y+1]... see note
    up = pltpu.roll(blurred, 1, axis=0)
    # pltpu.roll(x, s)[y] = x[y - s]; so roll(x, rp-1)[y] = x[y+1]
    pair = jnp.where(y_odd, jnp.maximum(blurred, up), jnp.maximum(blurred, down))
    left = pltpu.roll(pair, 1, axis=1)
    right_v = pltpu.roll(pair, w - 1, axis=1)
    cmax = jnp.where(x_odd, jnp.maximum(pair, left), jnp.maximum(pair, right_v))
    cmax = jnp.minimum(cmax, alias_map_max)
    out_ref[...] = jnp.where(in_cells, cmax, blurred)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def alias_filter(alias, skip, h: int, w: int, interpret: bool = False):
    """Filter chain on one (h, w) int32 alias map; `skip` bool (h, w)."""
    chunk = CORE + 2 * APRON
    n_chunks = -(-h // CORE)
    hp = n_chunks * CORE + 2 * APRON
    a_p = jnp.pad(alias.astype(jnp.int32), ((APRON, hp - h - APRON), (0, 0)))
    s_p = jnp.pad(skip.astype(jnp.int32), ((APRON, hp - h - APRON), (0, 0)))

    call = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, w), lambda: (0, 0)),
            pl.BlockSpec((chunk, w), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, w), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((chunk, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    outs = []
    for c in range(n_chunks):
        lo = c * CORE
        y0 = jnp.array([lo - APRON], jnp.int32)
        res = call(y0, jax.lax.dynamic_slice_in_dim(a_p, lo, chunk, 0),
                   jax.lax.dynamic_slice_in_dim(s_p, lo, chunk, 0))
        keep = min(CORE, h - c * CORE)
        outs.append(res[APRON : APRON + keep])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
