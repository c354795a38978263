"""Split the match_exposures_batch cost: sort vs bisection vs RANSAC.

At 1080p batch 16 the stage measures 1.72 ms/frame (tools/
profile_analysis1080.py); this times its three candidate hotspots in
isolation on representative shapes ((B, 230400) pair arrays).

Measured (v5e-1, r4), ms/frame:
  lax.sort 2-operand 230k        0.66   <- the window-selection sort
  jnp.sort 1-operand 230k        0.55   (dropping the dark carry buys 0.1)
  20-pass value bisection        0.31   <- the dark-median
  20-pass K=3 joint bisection    0.33   (3 order stats for 1 bisection cost)
  RANSAC 3000 x hi_nmax          0.33
  cumsum 230k                    1.28   (standalone; fuses far cheaper in
                                         context — white_detect runs two of
                                         them inside a 0.44 total)
Conclusion: the sort + bisection + RANSAC account for ~1.3 of the 1.72;
killing the sort requires a compaction-free window selection (the pair set
is order-free, but TPU has no cheap 230k->4.6k compaction: scatter
serializes, chunked sorts + sequential dynamic slices measure no better).
A K=3 joint bisection could replace the sort's order statistics but not
the window gather, so the sort stays. Left as the documented floor.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = int(os.environ.get("PR_B", "16"))
N = 360 * 640  # the 3x3-downsampled 1080p grid
HI = ((1922) * (1082) // 9) // 50

rng = np.random.default_rng(0)
bright = jnp.asarray(rng.integers(0, 1 << 16, (B, N), dtype=np.int32))
dark = jnp.asarray(rng.integers(0, 1 << 16, (B, N), dtype=np.int32))

print("devices:", jax.devices(), flush=True)


def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/frame", flush=True)


def leg_sort2(c, b, d):
    bs, dc = jax.vmap(lambda x, y: jax.lax.sort((x, y), num_keys=1))(b, d)
    return c + bs.sum(dtype=jnp.float32) * 1e-9 + dc.sum(dtype=jnp.float32) * 1e-9


def leg_sort1(c, b, d):
    bs = jnp.sort(b, axis=1)
    return c + bs.sum(dtype=jnp.float32) * 1e-9


def leg_bisect20(c, b, d):
    kd = jnp.full((B,), N // 2, jnp.int32)
    lo = jnp.full((B,), -(1 << 18), jnp.int32)
    hi = jnp.full((B,), 1 << 18, jnp.int32)
    for _ in range(20):
        mid = (lo + hi) >> 1
        cnt = (d <= mid[:, None]).sum(axis=1)
        take = cnt >= kd + 1
        hi = jnp.where(take, mid, hi)
        lo = jnp.where(take, lo, mid + 1)
    return c + lo.sum(dtype=jnp.float32)


def leg_bisect_k3(c, b, d):
    # joint 3-statistic bisection (bmed, b_lo, b_hi) on a (B, 3) lane
    kd = jnp.tile(jnp.asarray([N // 2, N * 98 // 100, N * 999 // 1000], jnp.int32), (B, 1))
    lo = jnp.full((B, 3), -(1 << 18), jnp.int32)
    hi = jnp.full((B, 3), 1 << 18, jnp.int32)
    for _ in range(20):
        mid = (lo + hi) >> 1
        cnt = (b[:, None, :] <= mid[:, :, None]).sum(axis=2)
        take = cnt >= kd + 1
        hi = jnp.where(take, mid, hi)
        lo = jnp.where(take, lo, mid + 1)
    return c + lo.sum(dtype=jnp.float32)


def leg_ransac(c, b, d):
    hb = b[:, :HI].astype(jnp.float32)
    hd = d[:, :HI].astype(jnp.float32)
    evs = jnp.arange(3000, dtype=jnp.float32) * 0.002
    a_cand = jnp.exp2(-evs)
    b_cand = 100.0 - 50.0 * a_cand
    e = hd[:, None, :] - (hb[:, None, :] * a_cand[None, :, None] + b_cand[None, :, None])
    inlier = jnp.abs(jnp.trunc(e)) < 50
    scores = inlier.sum(axis=2)
    return c + jnp.argmax(scores, axis=1).sum().astype(jnp.float32)


def leg_cumsum(c, b, d):
    o = jnp.cumsum((b > 1000).astype(jnp.int32), axis=1)
    return c + o[:, -1].sum(dtype=jnp.float32)


LEGS = {
    "sort2": lambda: timeit("lax.sort 2-operand 230k", leg_sort2, bright, dark),
    "sort1": lambda: timeit("jnp.sort 1-operand 230k", leg_sort1, bright, dark),
    "bisect20": lambda: timeit("20-pass value bisection", leg_bisect20, bright, dark),
    "bisectk3": lambda: timeit("20-pass K=3 joint bisection", leg_bisect_k3, bright, dark),
    "ransac": lambda: timeit("RANSAC 3000 x hi_nmax", leg_ransac, bright, dark),
    "cumsum": lambda: timeit("cumsum 230k", leg_cumsum, bright, dark),
}
for leg in os.environ.get("PR_LEGS", ",".join(LEGS)).split(","):
    LEGS[leg.strip()]()
