"""Unpack pipeline stage timing: transposes vs pallas kernel."""

import time
import sys

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
lane_tile = 4096
nbp = (nblocks + lane_tile - 1) // lane_tile * lane_tile
nw = U.words_for_pixels(n, BPP)

rng = np.random.default_rng(0)
words = jnp.asarray(np.broadcast_to(
    pack_bits_np(rng.integers(0, 1 << BPP, n).astype(np.uint16), BPP)[:nw], (B, nw)
).copy())


def timeit(name, fn, *args, iters=30):
    f = jax.jit(fn)
    c = f(jnp.uint32(0), *args)
    int(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch  {B/dt:8.0f} fps", flush=True)


def full(c, ws):
    o = U.unpack_batch(ws, BPP, H, W)
    return (o.astype(jnp.uint32) + c).sum(dtype=jnp.uint32)


def t_in(c, ws):
    needed = nblocks * wpb
    w = ws[:, :needed]
    wt = w.reshape(B, nblocks, wpb).transpose(0, 2, 1)
    wt = jnp.pad(wt, ((0, 0), (0, 0), (0, nbp - nblocks)))
    return (wt.astype(jnp.uint32) + c).sum(dtype=jnp.uint32)


def t_out(c, planes):
    out = planes[:, :, :nblocks].transpose(0, 2, 1).reshape(B, nblocks * ppb)
    return (out[:, :n].astype(jnp.uint32) + c).sum(dtype=jnp.uint32)


def kern_only(c, wt):
    import functools
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
        kern,
        grid=(B, nbp // lane_tile),
        in_specs=[pl.BlockSpec((1, wpb, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ppb, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ppb, nbp), jnp.uint16),
    )(wt)
    return (out.astype(jnp.uint32) + c).sum(dtype=jnp.uint32)


print("devices:", jax.devices(), flush=True)
wt_host = jnp.asarray(np.zeros((B, wpb, nbp), np.uint16))
planes_host = jnp.asarray(np.zeros((B, ppb, nbp), np.uint16))
timeit("full unpack_batch", full, words)
timeit("input transpose only", t_in, words)
timeit("output transpose only", t_out, planes_host)
timeit("pallas kernel only", kern_only, wt_host)
