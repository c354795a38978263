"""Unpack variant: grouped local transpose (B, G, 128, 7) -> (B, G, 7, 128)."""

import time
import sys

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
ppb, wpb = U._block_geometry(BPP)
nblocks = (n + ppb - 1) // ppb
nw = U.words_for_pixels(n, BPP)

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


def make_grouped(gt):
    GB = 128  # blocks per group (lane axis)
    G = (nblocks + GB - 1) // GB
    Gp = (G + gt - 1) // gt * gt
    mask = (1 << BPP) - 1

    def kern(in_ref, out_ref):
        for j in range(ppb):
            off = j * BPP
            a, sh = off >> 4, off & 15
            w0 = in_ref[0, :, a, :].astype(jnp.uint32)
            if sh + BPP <= 16:
                val = w0 >> (16 - BPP - sh)
            else:
                w1 = in_ref[0, :, a + 1, :].astype(jnp.uint32)
                val = ((w0 << 16) | w1) >> (32 - BPP - sh)
            out_ref[0, :, j, :] = (val & mask).astype(jnp.uint16)

    def run(c, ws):
        needed = nblocks * wpb
        w = ws[:, :needed]
        w = jnp.pad(w, ((0, 0), (0, Gp * GB * wpb - needed)))
        w4 = w.reshape(B, Gp, GB, wpb)
        wt = w4.transpose(0, 1, 3, 2)  # (B, Gp, wpb, GB) — local per group
        out = pl.pallas_call(
            kern,
            grid=(B, Gp // gt),
            in_specs=[pl.BlockSpec((1, gt, wpb, GB), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, gt, ppb, GB), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Gp, ppb, GB), jnp.uint16),
        )(wt)
        out = out.transpose(0, 1, 3, 2).reshape(B, Gp * GB * ppb)
        return (out[:, :n].astype(jnp.uint32) + c).sum(dtype=jnp.uint32)

    return run


def correctness(fn):
    out = jax.jit(lambda ws: fn(jnp.uint32(0), ws))(words)
    want = (ref_pixels.astype(np.uint64).sum() * B) & 0xFFFFFFFF
    return "OK" if (int(out) & 0xFFFFFFFF) == want else "MISMATCH"


print("devices:", jax.devices(), flush=True)
g = make_grouped(128)
print("correct grouped:", correctness(g), flush=True)
timeit("grouped gt=128", g, words)
for gt in (64, 256, 512):
    timeit(f"grouped gt={gt}", make_grouped(gt), words)
