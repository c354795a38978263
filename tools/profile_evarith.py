"""Time the arithmetic EV transforms vs the table gathers, and the full
chroma smooth batch in both modes, at 1080p on the live backend."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops import evarith
from mlvfs_tpu.ops.luts import raw2ev_lut, ev2raw_lut, EV_RESOLUTION

H, W, B = 1080, 1920, 8
BLACK = 2048
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1 << 14, (B, H, W), dtype=np.uint16))
lut = jnp.asarray(np.asarray(raw2ev_lut(BLACK, size=1 << 16)))
inv = jnp.asarray(np.asarray(ev2raw_lut())[10 * EV_RESOLUTION :])
small = jnp.asarray(rng.integers(0, 14 * EV_RESOLUTION, (B, 537, 957), dtype=np.int32))


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch(8)", flush=True)


print("devices:", jax.devices(), flush=True)
timeit("raw2ev16 gather (full frame)",
       lambda c, x: c + lut[jnp.clip(x.astype(jnp.int32), 0, 65535)].astype(jnp.float32).sum(), imgs)
timeit("raw2ev16 arith  (full frame)",
       lambda c, x: c + evarith.raw2ev16(x, BLACK).astype(jnp.float32).sum(), imgs)
timeit("ev2raw16 gather (2 cell planes)",
       lambda c, x: c + (inv[jnp.clip(x, 0, 14 * EV_RESOLUTION - 1)]
                         + inv[jnp.clip(x + 7, 0, 14 * EV_RESOLUTION - 1)]).astype(jnp.float32).sum(), small)
timeit("ev2raw16 arith  (2 cell planes)",
       lambda c, x: c + (evarith.ev2raw16_pos(jnp.clip(x, 0, 14 * EV_RESOLUTION - 1))
                         + evarith.ev2raw16_pos(jnp.clip(x + 7, 0, 14 * EV_RESOLUTION - 1))).astype(jnp.float32).sum(), small)

from mlvfs_tpu.ops.chroma_smooth import chroma_smooth_batch

for mode, label in (("0", "LUT gathers"), ("force", "arithmetic")):
    os.environ["MLVFS_TPU_EVARITH"] = mode
    evarith.self_check.cache_clear()
    for method in (2, 3, 5):
        f = lambda c, x, m=method: c + chroma_smooth_batch(x, m, BLACK).astype(jnp.float32).sum()
        c = f(jnp.zeros((), jnp.float32), imgs)
        float(c)
        t0 = time.perf_counter()
        for _ in range(5):
            c = f(c, imgs)
        float(c)
        dt = (time.perf_counter() - t0) / 5
        print(f"chroma_smooth {method}x{method} [{label:12s}] {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)
