"""Unpack variants: pad-to-8 transpose, lane_tile sweep, fused alternatives."""

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
words_np = np.broadcast_to(pack_bits_np(ref_pixels, BPP)[:nw], (B, nw)).copy()
words = jnp.asarray(words_np)


def timeit(name, fn, *args, iters=30, check=None):
    f = jax.jit(fn)
    c = f(jnp.uint32(0), *args)
    int(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:8.2f} ms/batch  {B/dt:8.0f} fps", flush=True)


def make_variant(lane_tile, pad8):
    nbp = (nblocks + lane_tile - 1) // lane_tile * lane_tile
    wdim = 8 if pad8 else wpb
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

    def run(c, ws):
        needed = nblocks * wpb
        w = ws[:, :needed]
        if pad8:
            w3 = w.reshape(B, nblocks, wpb)
            w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 8 - wpb)))
            wt = w3.transpose(0, 2, 1)
        else:
            wt = w.reshape(B, nblocks, wpb).transpose(0, 2, 1)
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, nbp - nblocks)))
        out = pl.pallas_call(
            kern,
            grid=(B, nbp // lane_tile),
            in_specs=[pl.BlockSpec((1, wdim, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ppb, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, ppb, nbp), jnp.uint16),
        )(wt)
        out = out[:, :, :nblocks].transpose(0, 2, 1).reshape(B, nblocks * ppb)
        return (out[:, :n].astype(jnp.uint32) + c).sum(dtype=jnp.uint32)

    return run


def correctness(fn):
    out = jax.jit(lambda ws: fn(jnp.uint32(0), ws))(words)
    want = (ref_pixels.astype(np.uint64).sum() * B) & 0xFFFFFFFF
    got = int(out) & 0xFFFFFFFF
    return "OK" if got == want else f"MISMATCH {got} != {want}"


print("devices:", jax.devices(), flush=True)
base = make_variant(4096, False)
print("correct base:", correctness(base), flush=True)
v8 = make_variant(4096, True)
print("correct pad8:", correctness(v8), flush=True)
timeit("base wpb=7 lane=4096 (current)", base, words)
timeit("pad8 lane=4096", v8, words)
for lt in (8192, 16384, 32768):
    timeit(f"pad8 lane={lt}", make_variant(lt, True), words)
    timeit(f"wpb7 lane={lt}", make_variant(lt, False), words)
