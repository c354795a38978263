"""Entry (g) for the unpack roofline ledger: host-side planar relayout.

The kernel's perf note (ops/unpack.py) attributes ~4.2 of 6.3 ms/batch-32
to the XLA minor-dim-7 input transpose, not HBM traffic. The untried move
(VERDICT r3 task 2) is to do that relayout on the host during the gather
and hand the kernel its preferred (wpb, nblocks) planar layout.

This harness measures both sides of that trade at 1080p/14bpp:
  1. host: ms/frame to produce the planar layout with numpy (three
     strategies + a memcpy floor), on this 1-CPU container;
  2. device: f/s of the planar-input kernel (input transpose elided) vs
     the current full path, at B=32 and B=128 (headline config).

Run on TPU:  python tools/profile_unpack10.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlvfs_tpu.format.bits import pack_bits_np
from mlvfs_tpu.ops import unpack as U

W, H, BPP = 1920, 1080, 14
n = W * H
ppb, wpb = U._block_geometry(BPP)  # 8, 7
nblocks = n // ppb
nw = U.words_for_pixels(n, BPP)
lane_tile = 4096
nbp = (nblocks + lane_tile - 1) // lane_tile * lane_tile
mask = (1 << BPP) - 1

rng = np.random.default_rng(0)
ref_pixels = rng.integers(0, 1 << BPP, n).astype(np.uint16)
words_np = pack_bits_np(ref_pixels, BPP)[:nw]

# --------------------------------------------------------------- host side
print("== host: packed (nblocks*7,) u16 -> planar (7, nblocks) ==", flush=True)
w2d = words_np.reshape(nblocks, wpb)
out_ring = np.empty((wpb, nblocks), "<u2")  # reused, like the gather ring


def htime(name, fn, iters=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:7.2f} ms/frame", flush=True)
    return dt


htime("transpose+ascontiguous (fresh)", lambda: np.ascontiguousarray(w2d.T))
htime("transpose into ring (out[:]=w2d.T)", lambda: out_ring.__setitem__(slice(None), w2d.T))


def per_plane():
    for a in range(wpb):
        out_ring[a, :] = w2d[:, a]


htime("7 strided plane copies into ring", per_plane)
flat = words_np
flat_ring = np.empty(nw, "<u2")
htime("memcpy floor (contiguous copy, same bytes)", lambda: flat_ring.__setitem__(slice(None), flat))

# ------------------------------------------------------------- device side
print("\n== device:", jax.devices(), "==", flush=True)


def planar_kernel_path(wt, b):
    """Planar (b, wpb, nbp) input -> (b, H, W) pixels. No input transpose."""

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
        grid=(b, nbp // lane_tile),
        in_specs=[pl.BlockSpec((1, wpb, lane_tile), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ppb, lane_tile), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ppb, nbp), jnp.uint16),
    )(wt)
    out = out[:, :, :nblocks].transpose(0, 2, 1).reshape(b, nblocks * ppb)
    return out[:, :n].reshape(b, H, W)


def dtime(name, fn, arg, b, iters=30):
    f = jax.jit(fn)
    c = f(jnp.uint32(0), arg)
    int(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, arg)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms/batch  {b/dt:8.0f} f/s", flush=True)


# transfer ONE frame over the (slow) relay; tile to batch on device
w1 = jax.device_put(words_np)
wt1 = jax.device_put(np.pad(np.ascontiguousarray(w2d.T), ((0, 0), (0, nbp - nblocks))))

for B in (32, 128):
    words = jax.jit(lambda x: jnp.tile(x[None], (B, 1)))(w1)
    wt = jax.jit(lambda x: jnp.tile(x[None], (B, 1, 1)))(wt1)
    jax.block_until_ready((words, wt))

    # correctness of the planar path (pull one frame back)
    got = jax.jit(lambda x: planar_kernel_path(x, B))(wt)
    np.testing.assert_array_equal(np.asarray(got[0]).ravel(), ref_pixels)

    dtime(f"B={B} full current (packed in HBM)",
          lambda c, w: c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32),
          words, B)
    dtime(f"B={B} planar-input kernel (g)",
          lambda c, w: c + planar_kernel_path(w, B).astype(jnp.uint32).sum(dtype=jnp.uint32),
          wt, B)
