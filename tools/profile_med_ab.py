"""A/B the chroma median implementation (Devillard network vs bitonic)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import medians

AB = os.environ.get("MED_AB", "net")
if AB == "bitonic":
    def _bitonic_pairs(n):
        pairs = []
        k = 2
        while k <= n:
            j = k >> 1
            while j >= 1:
                for i in range(n):
                    l = i ^ j
                    if l > i:
                        pairs.append((i, l) if (i & k) == 0 else (l, i))
                    j_ = j
                j >>= 1
            k <<= 1
        return pairs

    def median_planes_bitonic(planes):
        k_len = len(planes)
        n = 1
        while n < k_len:
            n <<= 1
        INF = np.int32(2**31 - 1)
        vals = list(planes) + [jnp.full_like(planes[0], INF)] * (n - k_len)
        for (a, b) in _bitonic_pairs(n):
            lo = jnp.minimum(vals[a], vals[b])
            hi = jnp.maximum(vals[a], vals[b])
            vals[a], vals[b] = lo, hi
        return vals[k_len // 2]

    medians.median_planes = median_planes_bitonic

from mlvfs_tpu.ops.chroma_smooth import chroma_smooth_batch

B, K = 32, 10
H, W = 1080, 1920
rng = np.random.default_rng(5)
imgs = jnp.asarray(rng.integers(0, 15000, size=(B, H, W), dtype=np.int64).astype(np.uint16))
print(f"devices: {jax.devices()}  AB={AB}", flush=True)

for m in (2, 3, 5):
    @jax.jit
    def run(x, m=m):
        return jax.lax.fori_loop(0, K, lambda i, v: chroma_smooth_batch(v, m, 2048).astype(jnp.uint16), x)

    @jax.jit
    def tiny(x):
        return x.reshape(-1)[:8].astype(jnp.uint32).sum(dtype=jnp.uint32)

    r = run(imgs)
    int(tiny(r))
    t0 = time.perf_counter()
    for _ in range(4):
        r = run(r)
    int(tiny(r))
    dt = (time.perf_counter() - t0) / 4 / K
    print(f"cs{m}x{m} [{AB:7s}] {dt*1e3:8.3f} ms/batch = {dt/B*1e3:6.3f} ms/frame", flush=True)
