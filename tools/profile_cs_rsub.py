"""Sweep the chroma Pallas kernel's row-chunk size (MLVFS_TPU_CS_RSUB)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops.chroma_smooth import chroma_smooth_batch
from mlvfs_tpu.ops import chroma_pallas

B, H, W = 8, 1080, 1920
rng = np.random.default_rng(5)
imgs = jnp.asarray(rng.integers(0, 15000, size=(B, H, W), dtype=np.int64).astype(np.uint16))
print("devices:", jax.devices(), "R_SUB:", chroma_pallas.R_SUB, flush=True)

for method in (2, 3, 5):
    f = jax.jit(
        lambda im, c, m=method: (chroma_smooth_batch(im, m, 2048).astype(jnp.uint32) + c).sum(
            dtype=jnp.uint32
        )
    )
    c = f(imgs, jnp.uint32(0))
    int(c)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        c = f(imgs, c)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"cs{method}x{method} R_SUB={chroma_pallas.R_SUB:4d}  {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)
