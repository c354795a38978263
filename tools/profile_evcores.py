"""Isolate the cost of the arithmetic EV cores at frame scale (XLA jit)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import evarith

B, H, W = 8, 1080, 1920
rng = np.random.default_rng(5)
p = jnp.asarray(rng.integers(0, 15000, size=(B, H, W), dtype=np.int64).astype(np.int32))
ev = jnp.asarray(rng.integers(0, 14 * 32768, size=(B, H, W), dtype=np.int64).astype(np.int32))
print("devices:", jax.devices(), flush=True)


def timeit(name, f, x):
    g = jax.jit(lambda v, c: (f(v).astype(jnp.uint32) + c).sum(dtype=jnp.uint32))
    c = g(x, jnp.uint32(0))
    int(c)
    t0 = time.perf_counter()
    for _ in range(5):
        c = g(x, c)
    int(c)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name:24s} {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)


timeit("raw2ev16", lambda v: evarith.raw2ev16(v, 2048), p)
timeit("ev2raw16_pos", lambda v: evarith.ev2raw16_pos(v), ev)
timeit("identity+1 (floor)", lambda v: v + 1, p)
