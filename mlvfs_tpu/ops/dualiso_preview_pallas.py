"""VMEM-resident Pallas kernel for the dual-ISO preview row transform.

The XLA formulation (dualiso.apply_preview) is a 1080-step lax.scan whose
per-step work is one (B, W) row — each step pays an HBM round trip for the
carry, a dynamic slice of the source, and a dynamic update of the output,
~7 us/step on v5e regardless of B. Here the whole pass is one kernel:

  * the batch rides the sublane axis — the frame stack is transposed to
    (H, B, W) so each row step computes on a full (B, W) vector tile;
  * the grid walks row chunks sequentially; the transformed rows y-2/y-1
    persist across chunks in a (2, B, W) VMEM scratch (the reference's
    row recurrence hdr.c:185-224 touches two rows back, same parity, so
    the carry is parity-indexed and the row loop processes even/odd pairs
    with static scratch slots);
  * the two-row look-ahead (`below = src[y+2]`) comes from a second view
    of the same input advanced one block, so block shapes stay uniform.

Numerics are the exact f32 op sequence of the XLA scan (same trunc/min/
where order per pixel), gated bit-identical by
tests/test_parity_dualiso_preview.py; the scan stays as the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_ROWS = 128  # rows per grid step (even: keeps the parity pairing static)


def _kernel(cur_ref, nxt_ref, a_ref, b_ref, s_ref, drs_ref, out_ref, carry,
            *, c_rows: int, h: int, black: int, white: int):
    c = pl.program_id(0)

    # Mosaic has no direct u16<->f32 casts; route through i32 (exact)
    f32 = lambda v: v.astype(jnp.int32).astype(jnp.float32)

    @pl.when(c == 0)
    def _init():
        # scan init: both carry rows start as source row 0 (dualiso.py:221)
        r0 = f32(cur_ref[0])
        carry[0] = r0
        carry[1] = r0

    af = a_ref[...]
    bf = b_ref[...]
    sf = s_ref[...]
    drs = drs_ref[...]
    blackf = jnp.float32(black)
    whitef = jnp.float32(white)
    y0 = c * c_rows

    def scale(p):
        return jnp.minimum(whitef, (p - blackf) * af + blackf + bf)

    def one_row(y, i, prev2):
        row = f32(cur_ref[i])
        # below = src[min(y+2, h-1)]; rows >= h are edge-replicated by the
        # caller's padding, so the raw y+2 read already clamps
        j = i + 2
        b_cur = f32(cur_ref[jnp.minimum(j, c_rows - 1)])
        b_nxt = f32(nxt_ref[jnp.maximum(j - c_rows, 0)])
        below = jnp.where(j < c_rows, b_cur, b_nxt)
        up_ok = y > 2
        down_ok = y < h - 2
        is_bright = ((y - drs + 4) % 4) >= 2

        over = row >= whitef
        repl = jnp.where(
            up_ok,
            jnp.where(down_ok, jnp.trunc((prev2 + below) / 2), prev2),
            below,
        )
        bright_out = jnp.where(over, jnp.trunc(repl), jnp.trunc(scale(row)))

        in_shadow = row < sf
        scaled_below = scale(below)
        dark_repl = jnp.where(
            up_ok,
            jnp.where(down_ok, jnp.trunc((prev2 + scaled_below) / 2), prev2),
            jnp.trunc(scaled_below),
        )
        dark_out = jnp.where(in_shadow, jnp.trunc(dark_repl), row)

        out = jnp.where(is_bright, bright_out, dark_out)
        out = jnp.clip(out, 0, 65535)
        # (u16 << 2) wraps mod 2^16; out is in [0, 65535] so the i32 route
        # with an explicit mask is identical
        out_ref[i] = ((out.astype(jnp.int32) << 2) & 0xFFFF).astype(jnp.uint16)
        return out

    def pair(k, _):
        i = 2 * k
        y = y0 + i
        carry[0] = one_row(y, i, carry[0])
        carry[1] = one_row(y + 1, i + 1, carry[1])
        return 0

    jax.lax.fori_loop(0, c_rows // 2, pair, 0)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def apply_preview_pallas(imgs, a, b, shadow, dark_row_start,
                         black: int, white: int, interpret: bool = False):
    """(B, H, W) uint16 batch; drop-in for the XLA apply_preview."""
    bsz, h, w = imgs.shape
    n_chunks = -(-h // C_ROWS)
    hp = (n_chunks + 1) * C_ROWS  # one extra block feeds the look-ahead view
    wp = -(-w // 128) * 128

    t = jnp.swapaxes(imgs, 0, 1)  # (H, B, W): batch on the sublane axis
    t = jnp.concatenate([t, jnp.broadcast_to(t[h - 1 : h], (hp - h, bsz, w))], 0)
    if wp > w:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, wp - w)))

    plane = lambda v, dt: jnp.broadcast_to(v.astype(dt)[:, None], (bsz, wp))
    a_p = plane(a, jnp.float32)
    b_p = plane(b, jnp.float32)
    s_p = plane(shadow, jnp.float32)
    d_p = plane(dark_row_start, jnp.int32)

    row_spec = pl.BlockSpec((C_ROWS, bsz, wp), lambda c: (c, 0, 0))
    scal_spec = pl.BlockSpec((bsz, wp), lambda c: (0, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, c_rows=C_ROWS, h=h, black=int(black), white=int(white)
        ),
        grid=(n_chunks,),
        in_specs=[
            row_spec,
            pl.BlockSpec((C_ROWS, bsz, wp), lambda c: (c + 1, 0, 0)),
            scal_spec,
            scal_spec,
            scal_spec,
            scal_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * C_ROWS, bsz, wp), jnp.uint16),
        scratch_shapes=[pltpu.VMEM((2, bsz, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(t, t, a_p, b_p, s_p, d_p)
    return jnp.swapaxes(out[:h, :, :w], 0, 1)
