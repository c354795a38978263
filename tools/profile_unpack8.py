"""MXU unpack with bf16 byte-split: words -> hi/lo bytes (exact in bf16),
one single-pass bf16 matmul gathers both straddling words' bytes."""
import time, sys
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

# A: (112, 256): col x gathers word for w0, col 128+x for w1
A = np.zeros((SB_W, 2 * SB_P), np.float32)
for x in range(SB_P):
    k, j = divmod(x, 8)
    a = (j * BPP) >> 4
    A[7 * k + a, x] = 1.0
    if 7 * k + a + 1 < SB_W:
        A[7 * k + a + 1, SB_P + x] = 1.0
A_bf = jnp.asarray(A, jnp.bfloat16)

def kern(w_ref, a_ref, out_ref):
    wl = w_ref[0].astype(jnp.int32)           # (TILE, 112)
    hi = (wl >> 8).astype(jnp.bfloat16)       # 0..255 exact in bf16
    lo = (wl & 0xFF).astype(jnp.bfloat16)
    gh = jnp.dot(hi, a_ref[:], preferred_element_type=jnp.float32)
    gl = jnp.dot(lo, a_ref[:], preferred_element_type=jnp.float32)
    w01 = (gh.astype(jnp.int32) << 8) | gl.astype(jnp.int32)   # (TILE, 256)
    w0 = w01[:, :SB_P].astype(jnp.uint32)
    w1 = w01[:, SB_P:].astype(jnp.uint32)
    lane = jax.lax.broadcasted_iota(jnp.int32, w0.shape, 1)
    shv = (32 - BPP - (((lane & 7) * BPP) & 15)).astype(jnp.uint32)
    val = (((w0 << 16) | w1) >> shv) & mask
    out_ref[0] = val.astype(jnp.int32).astype(jnp.uint16)

def make(tile_sb):
    def unpack_mxu(w):
        pad = nsb * SB_W - nw
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        m = w.reshape(B, nsb, SB_W)
        out = pl.pallas_call(
            kern,
            grid=(B, nsb // tile_sb),
            in_specs=[
                pl.BlockSpec((1, tile_sb, SB_W), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SB_W, 2 * SB_P), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_sb, SB_P), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nsb, SB_P), jnp.uint16),
        )(m, A_bf)
        return out.reshape(B, nsb * SB_P)[:, :n].reshape(B, H, W)
    return unpack_mxu

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
    timeit(f"bf16 byte-split tile={tile}", lambda c, w, f=f: c + f(w).astype(jnp.uint32).sum(dtype=jnp.uint32), words)
def t_cur(c, w):
    return c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32)
timeit("current pallas unpack", t_cur, words)
