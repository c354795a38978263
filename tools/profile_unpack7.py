"""Unpack via in-kernel roll/select gather: raw words in, pixel-order out.

Pixel lane x (within a 112-word/128-pixel superblock row) reads word
lane x - d(x) with d(x) = (x>>3) + (x&7 > 0) in 0..16 — 18 rolls and
static masked selects replace both XLA minor-dim relayouts.
"""
import time, sys, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import unpack as U
from mlvfs_tpu.format.bits import pack_bits_np

W, H, BPP, B = 1920, 1080, 14, 32
n = W * H
nw = U.words_for_pixels(n, BPP)
rng = np.random.default_rng(0)
ref_pixels = rng.integers(0, 1 << BPP, n).astype(np.uint16)
words = jnp.asarray(np.broadcast_to(pack_bits_np(ref_pixels, BPP)[:nw], (B, nw)).copy())

SB_W, SB_P = 112, 128
nsb = -(-nw // SB_W)
mask = (1 << BPP) - 1

# static per-lane tables
xs = np.arange(SB_P)
kk, jj = xs >> 3, xs & 7
dvec_np = kk + (jj > 0)
sh_np = (32 - BPP - ((jj * BPP) & 15)).astype(np.uint32)

def kern(w_ref, out_ref):
    wlanes = w_ref[0]                       # (TILE, 112) u16
    tile = wlanes.shape[0]
    w = jnp.pad(wlanes, ((0, 0), (0, SB_P - SB_W)))  # (TILE, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, SB_P), 1)
    dv = (lane >> 3) + jnp.where((lane & 7) > 0, 1, 0)
    w0 = jnp.zeros((tile, SB_P), jnp.uint16)
    w1 = jnp.zeros((tile, SB_P), jnp.uint16)
    rolls = {}
    for d in range(-1, 17):
        rolls[d] = w if d == 0 else jnp.roll(w, d, axis=1)
    for d in range(0, 17):
        sel = dv == d
        w0 = jnp.where(sel, rolls[d], w0)
        w1 = jnp.where(sel, rolls[d - 1], w1)
    jl = lane & 7
    shv = (32 - BPP - ((jl * BPP) & 15)).astype(jnp.uint32)
    val = (((w0.astype(jnp.int32).astype(jnp.uint32) << 16)
            | w1.astype(jnp.int32).astype(jnp.uint32)) >> shv) & mask
    out_ref[0] = val.astype(jnp.int32).astype(jnp.uint16)

def make(tile_sb):
    assert nsb % tile_sb == 0, (nsb, tile_sb)
    def unpack_roll(w):
        pad = nsb * SB_W - nw
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        m = w.reshape(B, nsb, SB_W)
        out = pl.pallas_call(
            kern,
            grid=(B, nsb // tile_sb),
            in_specs=[pl.BlockSpec((1, tile_sb, SB_W), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile_sb, SB_P), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nsb, SB_P), jnp.uint16),
        )(m)
        return out.reshape(B, nsb * SB_P)[:, :n].reshape(B, H, W)
    return unpack_roll

def timeit(name, fn, *args, iters=30):
    f = jax.jit(fn)
    c = f(jnp.uint32(0), *args)
    int(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:8.2f} ms/batch  {B/dt:8.0f} fps", flush=True)

print("devices:", jax.devices(), flush=True)
up = make(1800)
got = np.asarray(jax.jit(up)(words))[0].ravel()
print("exact:", np.array_equal(got, ref_pixels), flush=True)
for tile in (648, 1800, 3240):
    f = make(tile)
    timeit(f"roll-gather tile_sb={tile}", lambda c, w, f=f: c + f(w).astype(jnp.uint32).sum(dtype=jnp.uint32), words)
def t_cur(c, w):
    return c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32)
timeit("current pallas unpack", t_cur, words)
