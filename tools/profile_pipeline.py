"""Per-op device cost of the standard processing pipeline at 1080p/B=8."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import chroma_smooth as cs_ops
from mlvfs_tpu.ops import patternnoise as pn_ops
from mlvfs_tpu.ops import stripes as st_ops
from mlvfs_tpu.ops import pixels as px_ops
from mlvfs_tpu.ops import histogram as h_ops
from mlvfs_tpu.ops import dualiso as di_ops

W, H, B = 1920, 1080, 8
BLACK, WHITE = 2048, 15000
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1<<14, (B,H,W), dtype=np.uint16))

def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name:36s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.2f} ms/frame", flush=True)

print("devices:", jax.devices(), flush=True)
for m in (2,3,5):
    timeit(f"chroma_smooth method={m}",
           lambda c,x,m=m: c + cs_ops.chroma_smooth_batch(x, m, BLACK).astype(jnp.float32).sum(), imgs)
timeit("deflicker median",
       lambda c,x: c + jax.vmap(lambda im: h_ops.deflicker_median(im, (1<<14)+1))(x).astype(jnp.float32).sum(), imgs)
timeit("stripes apply",
       lambda c,x: c + st_ops.apply_correction_batch(x, jnp.full((8,),65536,jnp.int32), BLACK, WHITE).astype(jnp.float32).sum(), imgs)
timeit("pattern noise",
       lambda c,x: c + pn_ops.fix_pattern_noise_batch(x.astype(jnp.int16), WHITE).astype(jnp.float32).sum(), imgs)
pass  # dual-iso preview has a different API; skip
