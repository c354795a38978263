"""Input-relayout alternatives for the planar unpack kernel.

The known bottleneck (profile_unpack4) is the (nblocks, 7)-minor XLA
transpose. Untried layouts that move fewer elements or give the transpose a
fatter minor dim:
  - u32 pairing: bitcast word pairs to u32 -> (nblocks/2, 7) u32 transpose
  - superblock-56: 8 blocks = 56 words = 64 pixels -> (nsb, 56) u16
  - superblock-28 u32: (nsb, 28) u32 (half elements AND fat minor)
  - pad minor 7->8: (nblocks, 8) u16 transpose
Each is timed standalone (transpose + forced materialization), then the
promising ones as a full unpack path vs the current kernel.
"""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import unpack as U
from mlvfs_tpu.format.bits import pack_bits_np

W, H, BPP, B = 1920, 1080, 14, 32
n = W * H
ppb, wpb = U._block_geometry(BPP)  # 8, 7
nblocks = (n + ppb - 1) // ppb     # 259200
nw = U.words_for_pixels(n, BPP)
lane_tile = 4096

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
    print(f"{name:40s} {dt*1e3:8.2f} ms/batch  {B/dt:8.0f} fps", flush=True)


needed = nblocks * wpb  # = nw for 1080p? nw = ceil(n*14/16); n divisible by 8 so equal


def t_in7(c, w):
    wt = w[:, :needed].reshape(B, nblocks, wpb).transpose(0, 2, 1)
    return c + wt.astype(jnp.uint32).sum(dtype=jnp.uint32)


def t_in7_u32(c, w):
    d = lax.bitcast_convert_type(
        w[:, :needed].reshape(B, nblocks // 2, wpb, 2), jnp.uint32
    )  # (B, nblocks/2, 7) u32, dword k of superblock
    wt = d.transpose(0, 2, 1)
    return c + wt.sum(dtype=jnp.uint32)


NSB = nblocks // 8  # 64-pixel superblocks


def t_in56(c, w):
    wt = w[:, :needed].reshape(B, NSB, 56).transpose(0, 2, 1)
    return c + wt.astype(jnp.uint32).sum(dtype=jnp.uint32)


def t_in28_u32(c, w):
    d = lax.bitcast_convert_type(
        w[:, :needed].reshape(B, NSB, 28, 2), jnp.uint32
    )
    wt = d.transpose(0, 2, 1)
    return c + wt.sum(dtype=jnp.uint32)


def t_in8pad(c, w):
    w3 = w[:, :needed].reshape(B, nblocks, wpb)
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 1)))
    wt = w3.transpose(0, 2, 1)
    return c + wt.astype(jnp.uint32).sum(dtype=jnp.uint32)


def t_in112_u32(c, w):
    d = lax.bitcast_convert_type(
        w[:, :needed].reshape(B, nblocks // 32, 112, 2), jnp.uint32
    )
    wt = d.transpose(0, 2, 1)
    return c + wt.sum(dtype=jnp.uint32)


# ---- full paths -----------------------------------------------------------

mask = (1 << BPP) - 1


def full_current(c, w):
    return c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32)


def _pallas_planar(wt, nplanes_in, nplanes_out, kern, lanes):
    lpad = (lanes + lane_tile - 1) // lane_tile * lane_tile
    wt = jnp.pad(wt, ((0, 0), (0, 0), (0, lpad - lanes)))
    return pl.pallas_call(
        kern,
        grid=(B, lpad // lane_tile),
        in_specs=[pl.BlockSpec((1, nplanes_in, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nplanes_out, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nplanes_out, lpad), jnp.uint16),
    )(wt)[:, :, :lanes]


def full_56(c, w):
    # (B, NSB, 56) -> (B, 56, NSB); kernel emits 64 planes; inverse transpose
    wt = w[:, :needed].reshape(B, NSB, 56).transpose(0, 2, 1)

    def kern(in_ref, out_ref):
        for j in range(64):
            off = j * BPP
            a, sh = off >> 4, off & 15
            w0 = in_ref[0, a, :].astype(jnp.uint32)
            if sh + BPP <= 16:
                val = w0 >> (16 - BPP - sh)
            else:
                w1 = in_ref[0, a + 1, :].astype(jnp.uint32)
                val = ((w0 << 16) | w1) >> (32 - BPP - sh)
            out_ref[0, j, :] = (val & mask).astype(jnp.uint16)

    out = _pallas_planar(wt, 56, 64, kern, NSB)
    out = out.transpose(0, 2, 1).reshape(B, NSB * 64)
    return c + out[:, :n].astype(jnp.uint32).sum(dtype=jnp.uint32)


def full_28_u32(c, w):
    d = lax.bitcast_convert_type(w[:, :needed].reshape(B, NSB, 28, 2), jnp.uint32)
    wt = d.transpose(0, 2, 1)  # (B, 28, NSB) u32

    def kern(in_ref, out_ref):
        for j in range(64):
            off = j * BPP
            a, sh = off >> 4, off & 15
            k = a >> 1
            dk = in_ref[0, k, :]
            if sh + BPP <= 16:
                w0 = (dk & 0xFFFF) if (a & 1) == 0 else (dk >> 16)
                val = w0 >> (16 - BPP - sh)
            elif (a & 1) == 0:
                # w_a, w_{a+1} both in dword k: (lo<<16)|hi = 16-bit rotate
                comb = ((dk & 0xFFFF) << 16) | (dk >> 16)
                val = comb >> (32 - BPP - sh)
            else:
                dk1 = in_ref[0, k + 1, :]
                comb = (dk & jnp.uint32(0xFFFF0000)) | (dk1 & 0xFFFF)
                val = comb >> (32 - BPP - sh)
            out_ref[0, j, :] = (val & mask).astype(jnp.uint16)

    lpad = (NSB + lane_tile - 1) // lane_tile * lane_tile
    wt = jnp.pad(wt, ((0, 0), (0, 0), (0, lpad - NSB)))
    out = pl.pallas_call(
        kern,
        grid=(B, lpad // lane_tile),
        in_specs=[pl.BlockSpec((1, 28, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 64, lane_tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, lpad), jnp.uint16),
    )(wt)[:, :, :NSB]
    out = out.transpose(0, 2, 1).reshape(B, NSB * 64)
    return c + out[:, :n].astype(jnp.uint32).sum(dtype=jnp.uint32)


print("devices:", jax.devices(), flush=True)

# correctness of the new full paths
got = jax.jit(lambda w: U.unpack_batch(w, BPP, H, W))(words)
np.testing.assert_array_equal(np.asarray(got[0]).ravel(), ref_pixels)


def check(fullfn, name):
    @jax.jit
    def run(w):
        c = jnp.uint32(0)
        return fullfn(c, w)
    # rebuild the pixel output by re-deriving: cheaper to just compare sums
    want = np.uint32(ref_pixels.astype(np.uint64).sum() * B & 0xFFFFFFFF)
    gotc = np.uint32(int(run(words)) & 0xFFFFFFFF)
    assert gotc == want, f"{name}: checksum {gotc} != {want}"
    print(f"{name}: checksum OK", flush=True)


check(full_56, "full_56")
check(full_28_u32, "full_28_u32")

timeit("in: (nblocks,7) u16 [current]", t_in7, words)
timeit("in: (nblocks/2,7) u32", t_in7_u32, words)
timeit("in: (nsb,56) u16", t_in56, words)
timeit("in: (nsb,28) u32", t_in28_u32, words)
timeit("in: (nblocks,8) u16 padded", t_in8pad, words)
timeit("in: (nsb32,112) u32", t_in112_u32, words)
timeit("full: current", full_current, words)
timeit("full: 56-superblock", full_56, words)
timeit("full: 28-u32-superblock", full_28_u32, words)
