"""Unpack via MXU permutation: one selection matmul replaces all relayouts.

112 packed u16 words = 16 raw_pixblocks = 128 pixels. A (112, 256) 0/1
matrix gathers each pixel's straddling word pair (w0|w1) into pixel-order
lanes; the rest is a lane-aligned shift+mask. No minor-dim transposes.
"""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import unpack as U
from mlvfs_tpu.format.bits import pack_bits_np

W, H, BPP, B = 1920, 1080, 14, 32
n = W * H
ppb, wpb = U._block_geometry(BPP)   # 8, 7
nw = U.words_for_pixels(n, BPP)

rng = np.random.default_rng(0)
ref_pixels = rng.integers(0, 1 << BPP, n).astype(np.uint16)
words = jnp.asarray(np.broadcast_to(pack_bits_np(ref_pixels, BPP)[:nw], (B, nw)).copy())

SB_W, SB_P = 7 * 16, 8 * 16   # words, pixels per superblock
nsb = -(-nw // SB_W)

# selection matrices: pixel lane x (block k=x>>3, j=x&7) needs words
# 7k+a and 7k+a+1 where a=(14j)>>4
A = np.zeros((SB_W, 2 * SB_P), np.float32)
shifts = np.zeros(SB_P, np.uint32)
for x in range(SB_P):
    k, j = divmod(x, 8)
    off = j * BPP
    a, sh = off >> 4, off & 15
    A[7 * k + a, x] = 1.0
    if 7 * k + a + 1 < SB_W:
        A[7 * k + a + 1, SB_P + x] = 1.0
    shifts[x] = 32 - BPP - sh
A_j = jnp.asarray(A)
shifts_j = jnp.asarray(shifts)
mask = (1 << BPP) - 1

def unpack_mxu(w):
    pad = nsb * SB_W - nw
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    m = w.reshape(B * nsb, SB_W).astype(jnp.float32)
    g = jnp.dot(m, A_j, preferred_element_type=jnp.float32)
    w0 = g[:, :SB_P].astype(jnp.uint32)
    w1 = g[:, SB_P:].astype(jnp.uint32)
    val = (((w0 << 16) | w1) >> shifts_j[None, :]) & mask
    out = val.astype(jnp.uint16).reshape(B, nsb * SB_P)
    return out[:, :n].reshape(B, H, W)

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
# correctness first
got = np.asarray(jax.jit(unpack_mxu)(words))[0].ravel()
print("exact:", np.array_equal(got, ref_pixels), flush=True)

def t_mxu(c, w):
    return c + unpack_mxu(w).astype(jnp.uint32).sum(dtype=jnp.uint32)
def t_cur(c, w):
    return c + U.unpack_batch(w, BPP, H, W).astype(jnp.uint32).sum(dtype=jnp.uint32)
timeit("mxu permutation unpack", t_mxu, words)
timeit("current pallas unpack", t_cur, words)
