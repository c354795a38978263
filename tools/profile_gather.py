"""Micro-benchmark: per-frame row-permutation strategies on TPU.

The squeeze/de-squeeze in amaze.py permutes rows with a traced per-frame
index vector. Candidates:
  A. vmapped dynamic gather img[idx]            (current)
  B. one-hot matmul permutation (MXU)
  C. lax.switch over the 4 static phase permutations
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

H, W, B = 960, 1280, 8

rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1 << 20, (B, H, W)).astype(np.float32))
# a realistic squeeze permutation per frame (phase varies)
perms = np.stack([np.random.default_rng(i).permutation(H) for i in range(B)])
idx = jnp.asarray(perms.astype(np.int32))
phase = jnp.asarray(np.arange(B) % 4, jnp.int32)

STATIC_PERMS = [np.roll(np.arange(H), p).astype(np.int32) for p in range(4)]


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/batch  {dt/B*1e3:6.3f} ms/frame")


def gather(c, imgs, idx):
    o = jax.vmap(lambda im, ix: im[ix])(imgs, idx)
    return c + o.sum() * 1e-9


def gather_take(c, imgs, idx):
    o = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(imgs, idx)
    return c + o.sum() * 1e-9


def onehot_matmul(c, imgs, idx):
    def one(im, ix):
        P = (ix[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
        return jax.lax.dot(P, im, precision=jax.lax.Precision.HIGHEST)
    o = jax.vmap(one)(imgs, idx)
    return c + o.sum() * 1e-9


def switch4(c, imgs, ph):
    def one(im, p):
        return jax.lax.switch(p, [lambda im=im, sp=sp: im[sp] for sp in map(jnp.asarray, STATIC_PERMS)])
    o = jax.vmap(one)(imgs, ph)
    return c + o.sum() * 1e-9


def static_gather(c, imgs):
    sp = jnp.asarray(STATIC_PERMS[1])
    o = imgs[:, sp]
    return c + o.sum() * 1e-9


print("devices:", jax.devices())
timeit("A vmapped dynamic gather", gather, imgs, idx)
timeit("A' vmapped take", gather_take, imgs, idx)
timeit("B one-hot matmul (HIGHEST)", onehot_matmul, imgs, idx)
timeit("C switch over static perms", switch4, imgs, phase)
timeit("D static-index gather (floor)", static_gather, imgs)
