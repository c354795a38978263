"""Attribute chroma-smooth cost: gather vs slices vs sort vs scatter."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from mlvfs_tpu.ops.luts import raw2ev_lut, ev2raw_lut, EV_RESOLUTION

H, W, B = 1080, 1920, 8
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1<<14, (B,H,W), dtype=np.uint16))
lut = jnp.asarray(np.asarray(raw2ev_lut(2048, size=1<<16)))
inv = jnp.asarray(np.asarray(ev2raw_lut())[10*EV_RESOLUTION:])

def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    c = f(jnp.zeros((), jnp.float32), *args); float(c)
    t0 = time.perf_counter()
    for _ in range(iters): c = f(c, *args)
    float(c)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms/batch", flush=True)

print("devices:", jax.devices(), flush=True)
timeit("raw2ev gather (full frame)", lambda c,x: c + lut[jnp.clip(x.astype(jnp.int32),0,65535)].astype(jnp.float32).sum(), imgs)
small = jnp.asarray(rng.integers(0, 14*EV_RESOLUTION, (B,537,957), dtype=np.int32))
timeit("ev2raw gather (2x cells)", lambda c,x: c + (inv[jnp.clip(x,0,14*EV_RESOLUTION-1)] + inv[jnp.clip(x+7,0,14*EV_RESOLUTION-1)]).astype(jnp.float32).sum(), small)
def slices(c, x):
    s = x.astype(jnp.int32)
    acc = jnp.zeros((B, 537, 957), jnp.int32)
    for dy in range(2):
        for dx in range(2):
            for i in (-2,0,2):
                acc = acc + jax.lax.slice(s, (0,4+dy,4+dx+i if 4+dx+i>=0 else 0), (B,4+dy+537*2-1,4+dx+i+957*2-1), (1,2,2))[:, :537, :957]
    return c + acc.astype(jnp.float32).sum()
timeit("12 strided cell slices", slices, imgs)
st = jnp.asarray(rng.integers(-200000, 200000, (9,B,537,957), dtype=np.int32))
timeit("sort9 + mid", lambda c,x: c + jnp.sort(x, axis=0)[4].astype(jnp.float32).sum(), st)
def scat(c, x):
    out = x.at[:, 4:4+537*2:2, 4:4+957*2:2].set(x[:, :537*2:2, :957*2:2] + 1)
    return c + out.astype(jnp.float32).sum()
timeit("strided scatter .at.set", scat, imgs.astype(jnp.int32))
