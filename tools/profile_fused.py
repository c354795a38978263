"""Bisect the fused unpack→deflicker→chroma→stripes program's cost on TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.format import synth
from mlvfs_tpu.format.bits import pack_bits_np
from mlvfs_tpu.ops.unpack import unpack_batch, words_for_pixels
from mlvfs_tpu.ops import histogram as hist_ops
from mlvfs_tpu.ops.chroma_smooth import chroma_smooth_batch
from mlvfs_tpu.ops.stripes import apply_correction_batch

B, H, W, BPP = 8, 1080, 1920, 14
rng = np.random.default_rng(7)
spec = synth.SynthSpec(width=W, height=H, frames=1, bpp=BPP)
frame = synth.make_frame_data(spec, rng)
words1 = pack_bits_np(frame.ravel(), BPP)
n_words = words_for_pixels(W * H, BPP)
words = jax.device_put(np.ascontiguousarray(np.broadcast_to(words1[:n_words], (B, n_words))))
gains = jax.device_put(np.full(8, 65537, np.int32))
print("devices:", jax.devices(), flush=True)


def timeit(label, fn, iters=5):
    c = fn(jnp.uint32(0))
    int(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c)
    int(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms/batch = {dt/B*1e3:6.2f} ms/frame", flush=True)


def stage(kind):
    def f(wsd, g, c):
        imgs = unpack_batch(wsd, BPP, H, W)
        acc = jnp.uint32(0)
        if kind >= 2:
            med = jax.vmap(lambda im: hist_ops.deflicker_median(im, (1 << BPP) + 1))(imgs)
            acc = acc + med.sum().astype(jnp.uint32)
        if kind >= 3:
            imgs = chroma_smooth_batch(imgs, 3, 2048)
        if kind >= 4:
            imgs = apply_correction_batch(imgs, g, 2048, 15000)
        return (imgs.astype(jnp.uint32) + c).sum(dtype=jnp.uint32) + acc
    return jax.jit(f)

for kind, name in ((1, "unpack"), (2, "+deflicker"), (3, "+cs3x3"), (4, "+stripes")):
    f = stage(kind)
    timeit(name, lambda c, f=f: f(words, gains, c))
