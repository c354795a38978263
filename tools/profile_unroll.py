"""Sweep scan unroll factors for the chroma-smooth and dilate scans."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import amaze_core as core

H, W, B = 960, 1280, 8
hp, wp = H + 32, W + 32
xb = jnp.asarray(np.random.default_rng(0).random((B, hp, wp)).astype(np.float32))
rbm = jnp.ones((hp, wp), jnp.float32)


def timeit(name, fn, *args, iters=4):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/frame", flush=True)


import mlvfs_tpu.ops.amaze_core as mod
src_scan = jax.lax.scan

for u in (1, 4, 8, 16, 32):
    def scan_u(step, init, xs, unroll=16, _u=u, **kw):
        return src_scan(step, init, xs, unroll=_u)
    jax.lax.scan_orig = src_scan

    def chroma(c, x, _u=u):
        def one(xi):
            import unittest.mock as m
            with m.patch.object(jax.lax, "scan", scan_u):
                p, q = core._chroma_smooth_scan(xi, xi + 1.0, rbm > 0, rbm > 0, hp, wp)
            return p + q
        o = jax.vmap(one)(x)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    def dilate(c, x, _u=u):
        def one(xi):
            import unittest.mock as m
            with m.patch.object(jax.lax, "scan", scan_u):
                return core._nyquist_dilate(xi, rbm, hp, wp)
        o = jax.vmap(one)(x)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    timeit(f"chroma unroll={u}", chroma, xb)
    timeit(f"dilate unroll={u}", dilate, xb)
