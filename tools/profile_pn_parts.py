"""Bisect pattern-noise cost after the Pallas blur: columns vs transpose
vs reassembly."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MLVFS_TPU_PN_PALLAS", "1")

from mlvfs_tpu.ops import patternnoise as pn
from mlvfs_tpu.ops.patternnoise_pallas import edge_aware_blur_pallas

H, W, B = 1080, 1920, 8
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 1 << 14, (B, H, W), dtype=np.uint16))
print("devices:", jax.devices(), flush=True)


def timeit(label, fn, iters=5):
    c = fn(jnp.zeros((), jnp.float32))
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)


f_all = jax.jit(lambda x: pn.fix_pattern_noise_batch(x, 15000).astype(jnp.float32).sum())
timeit("full pattern noise", lambda c: c + f_all(imgs))

# one direction only
@jax.jit
def one_dir(x):
    raw = x.astype(jnp.int16).astype(jnp.int32)
    out = jax.vmap(lambda im: pn._fix_column_noise_rggb(im, 15000))(raw)
    return out.astype(jnp.float32).sum()

timeit("one direction (no transpose)", lambda c: c + one_dir(imgs))

# transpose cost alone
@jax.jit
def tr(x):
    raw = x.astype(jnp.int16).astype(jnp.int32)
    return jnp.swapaxes(raw, 1, 2).astype(jnp.float32).sum()

timeit("batch transpose alone", lambda c: c + tr(imgs))

# blur alone for the batch (4 channels, one direction), via vmap
@jax.jit
def blur_b(x):
    raw = x.astype(jnp.int16).astype(jnp.int32)
    def f(im):
        r = im[0::2, 0::2]; g1 = im[0::2, 1::2]; g2 = im[1::2, 0::2]; b = im[1::2, 1::2]
        rs, g1s, g2s, bs = edge_aware_blur_pallas(r, g1, g2, b)
        return rs.sum() + g1s.sum() + g2s.sum() + bs.sum()
    return jax.vmap(f)(raw).astype(jnp.float32).sum()

timeit("blur only (batch, 1 direction)", lambda c: c + blur_b(imgs))

# channel split + column noise WITHOUT blur (feed denoised = chan)
@jax.jit
def cols_only(x):
    raw = x.astype(jnp.int16).astype(jnp.int32)
    def f(im):
        r = im[0::2, 0::2]; g1 = im[0::2, 1::2]; g2 = im[1::2, 0::2]; b = im[1::2, 1::2]
        outs = [pn._fix_column_noise(c.astype(jnp.int32), c, 15000) for c in (r, g1, g2, b)]
        h2, w2 = outs[0].shape
        top = jnp.stack([outs[0], outs[1]], axis=-1).reshape(h2, 2 * w2)
        bot = jnp.stack([outs[2], outs[3]], axis=-1).reshape(h2, 2 * w2)
        return jnp.stack([top, bot], axis=1).reshape(2 * h2, 2 * w2).sum()
    return jax.vmap(f)(raw).astype(jnp.float32).sum()

timeit("split+columns+reassemble (no blur)", lambda c: c + cols_only(imgs))
