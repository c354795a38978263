"""Time pattern noise: XLA bisection path vs the VMEM-resident Pallas blur."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H, W, B = 1080, 1920, 8
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1 << 14, (B, H, W), dtype=np.uint16))

print("devices:", jax.devices(), flush=True)

from mlvfs_tpu.ops import patternnoise as pn


def timeit(label, fn, iters=5):
    c = fn(jnp.zeros((), jnp.float32))
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)


for mode, label in (("0", "XLA bisection"), ("1", "Pallas blur")):
    os.environ["MLVFS_TPU_PN_PALLAS"] = mode
    f = jax.jit(lambda x: pn.fix_pattern_noise_batch(x, 15000).astype(jnp.float32).sum())
    timeit(f"pattern noise [{label}]", lambda c: c + f(imgs))
    jax.clear_caches()

# blur alone (pallas), one frame's four channels
os.environ["MLVFS_TPU_PN_PALLAS"] = "1"
from mlvfs_tpu.ops.patternnoise_pallas import edge_aware_blur_pallas

chans = [jnp.asarray(rng.integers(0, 16000, (540, 960), dtype=np.int32)) for _ in range(4)]
g = jax.jit(lambda a, b_, c_, d: sum(x.astype(jnp.float32).sum() for x in edge_aware_blur_pallas(a, b_, c_, d)))


def blur(c):
    return c + g(*chans)


timeit("blur alone (1 frame, 1 direction)", blur, iters=10)
