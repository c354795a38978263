"""Split the unpack path: input transpose | kernel | output transpose."""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import unpack as U
from mlvfs_tpu.format.bits import pack_bits_np

W, H, BPP, B = 1920, 1080, 14, 32
n = W * H
ppb, wpb = U._block_geometry(BPP)
nblocks = (n + ppb - 1) // ppb
nw = U.words_for_pixels(n, BPP)
lane_tile = 4096
nbp = (nblocks + lane_tile - 1) // lane_tile * lane_tile

rng = np.random.default_rng(0)
ref_pixels = rng.integers(0, 1 << BPP, n).astype(np.uint16)
words = jnp.asarray(np.broadcast_to(pack_bits_np(ref_pixels, BPP)[:nw], (B, nw)).copy())

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

needed = nblocks * wpb
def t_in(c, w):
    wt = w[:, :needed].reshape(B, nblocks, wpb).transpose(0, 2, 1)
    wt = jnp.pad(wt, ((0,0),(0,0),(0, nbp - nblocks)))
    return c + wt.astype(jnp.uint32).sum(dtype=jnp.uint32)

wt0 = jnp.asarray(np.zeros((B, wpb, nbp), "<u2"))
def t_kernel(c, wt):
    # kernel only, planar in → planar out
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    mask = (1 << BPP) - 1
    def kern(in_ref, out_ref):
        for j in range(ppb):
            off = j * BPP
            a, sh = off >> 4, off & 15
            w0 = in_ref[0, a, :].astype(jnp.uint32)
            if sh + BPP <= 16:
                val = w0 >> (16 - BPP - sh)
            else:
                w1 = in_ref[0, a + 1, :].astype(jnp.uint32)
                val = ((w0 << 16) | w1) >> (32 - BPP - sh)
            out_ref[0, j, :] = (val & mask).astype(jnp.uint16)
    out = pl.pallas_call(
        kern, grid=(B, nbp // lane_tile),
        in_specs=[pl.BlockSpec((1, wpb, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ppb, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ppb, nbp), jnp.uint16),
    )(wt)
    return c + out.astype(jnp.uint32).sum(dtype=jnp.uint32)

pix0 = jnp.asarray(np.zeros((B, ppb, nbp), np.uint16))
def t_out(c, p):
    out = p[:, :, :nblocks].transpose(0, 2, 1).reshape(B, nblocks * ppb)
    return c + out[:, :n].astype(jnp.uint32).sum(dtype=jnp.uint32)

def t_full(c, w):
    return c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32)

print("devices:", jax.devices(), flush=True)
timeit("full path", t_full, words)
timeit("input transpose (7-minor)", t_in, words)
timeit("kernel only (planar->planar)", t_kernel, wt0)
timeit("output transpose (8-minor)", t_out, pix0)
