"""Dual-ISO preview path device stages at 1080p/B=8."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import dualiso as di

W, H, B = 1920, 1080, 8
BLACK, WHITE = 2048, 15000
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1<<14, (B,H,W), dtype=np.uint16))

def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args); float(c)
    t0 = time.perf_counter()
    for _ in range(iters): c = f(c, *args)
    float(c)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch", flush=True)

print("devices:", jax.devices(), flush=True)
# host-side function now (device slices + np.bincount): time it directly
import time as _t
di.green_phase_histograms(imgs, WHITE)
t0 = _t.perf_counter()
for _ in range(5):
    di.green_phase_histograms(imgs, WHITE)
print(f"{'green_phase_histograms (host)':34s} {(_t.perf_counter()-t0)/5*1e3:8.2f} ms/batch", flush=True)
a = jnp.full((B,), 0.3); bb = jnp.zeros((B,)); sh = jnp.zeros((B,)); drs = jnp.zeros((B,), jnp.int32)
timeit("apply_preview",
       lambda c,x: c + di.apply_preview(x, a, bb, sh, drs, BLACK, WHITE).astype(jnp.float32).sum(), imgs)
