"""Dispatch-floor-free per-op device timing: K passes inside ONE jitted
program via lax.fori_loop, each pass feeding the next (no hoisting), so
the remote relay's per-dispatch latency (~1.4 ms on this rig — measured:
an identity program at B=8 costs 6.9 ms/batch) divides by K instead of
polluting every iteration. This is the honest device-throughput number:
production hosts keep the dispatch queue deep enough that launch latency
overlaps compute; this rig's relay serializes it.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mlvfs_tpu.format import synth
from mlvfs_tpu.format.bits import pack_bits_np
from mlvfs_tpu.ops.unpack import unpack_batch, words_for_pixels

B = int(os.environ.get("PR_B", "8"))
K = int(os.environ.get("PR_K", "10"))
H, W, BPP = 1080, 1920, 14
rng = np.random.default_rng(5)
spec = synth.SynthSpec(width=W, height=H, frames=1, bpp=BPP)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())
words1 = pack_bits_np(frame.ravel(), BPP)
n_words = words_for_pixels(W * H, BPP)
words = jax.device_put(np.ascontiguousarray(np.broadcast_to(words1[:n_words], (B, n_words))))
print(f"devices: {jax.devices()}  B={B} K={K}", flush=True)


def timeit_chain(name, body, x0, iters=4):
    """body: x -> x (same shape/dtype). One jit with K in-program passes.

    block_until_ready returns early through this rig's remote relay, so
    the only trustworthy sync is a host transfer: fetch a 1-element
    reduction once per timing loop (iters dispatches chain device-side)."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, v: body(v), x)

    @jax.jit
    def tiny(x):
        return x.reshape(-1)[:8].astype(jnp.uint32).sum(dtype=jnp.uint32)

    r = run(x0)
    int(tiny(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(r)
    int(tiny(r))
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{name:36s} {dt*1e3:8.3f} ms/batch = {dt/B*1e3:7.3f} ms/frame  ({B*1.0/dt:8.0f} f/s)", flush=True)


def img_chain(f):
    """Make a u16-image -> u16-image body out of op f."""
    return lambda v: f(v).astype(jnp.uint16)


timeit_chain("identity+1", lambda v: v + 1, imgs)

# unpack: carry words; xor a data-dependent word back in to defeat hoisting
def unpack_body(ws):
    out = unpack_batch(ws, BPP, H, W)
    tap = (out[:, :1, :1] & 1).astype(ws.dtype)
    return ws ^ jnp.pad(tap.reshape(B, 1), ((0, 0), (0, ws.shape[1] - 1)))

timeit_chain("unpack 14-bit", unpack_body, words)

from mlvfs_tpu.ops.chroma_smooth import chroma_smooth_batch

for m in (2, 3, 5):
    timeit_chain(f"chroma cs{m}x{m}", img_chain(lambda v, m=m: chroma_smooth_batch(v, m, 2048)), imgs)

from mlvfs_tpu.ops.stripes import apply_correction_batch

gains = jax.device_put(np.full(8, 65537, np.int32))
timeit_chain("stripes apply", img_chain(lambda v: apply_correction_batch(v, gains, 2048, 15000)), imgs)

from mlvfs_tpu.ops import histogram as hist_ops

def deflicker_body(v):
    med = jax.vmap(lambda im: hist_ops.deflicker_median(im, (1 << BPP) + 1))(v)
    return v + (med[:, None, None] & 1).astype(v.dtype)

timeit_chain("deflicker median", deflicker_body, imgs)

from mlvfs_tpu.ops import patternnoise as pn_ops

timeit_chain("pattern noise", img_chain(lambda v: pn_ops.fix_pattern_noise_batch(v, 15000)), imgs)

# bad/focus pixel fix: a 1000-entry synthetic pixel list (typical .fpm scale)
from mlvfs_tpu.ops import pixels as pixel_ops

_pl_rng = np.random.default_rng(9)
_plist = np.stack(
    [_pl_rng.integers(8, W - 8, 1000), _pl_rng.integers(8, H - 8, 1000)], axis=1
).astype(np.int64)

timeit_chain(
    "pixel-list fix (1000 px)",
    img_chain(lambda v: pixel_ops.fix_pixel_list_batch(v, _plist, 2048, 0, 0, dual_iso=False)),
    imgs,
)

# dual-ISO preview device legs (the host LS fit between them is ~free)
from mlvfs_tpu.ops import dualiso as di_ops

# (green_phase_histograms pulls its per-phase histograms to host for
# the LS fit by design, so it cannot chain inside fori_loop)

_pa = jnp.full(B, 0.125, jnp.float32)
_pb = jnp.zeros(B, jnp.float32)
_psh = jnp.zeros(B, jnp.float32)
_pdrs = jnp.zeros(B, jnp.int32)

timeit_chain(
    "dualiso preview: apply",
    img_chain(lambda v: di_ops.apply_preview(v, _pa, _pb, _psh, _pdrs, 2048, 15000) >> 2),
    imgs,
)

# the bench.py fused pipeline, chained on the words carry
import __graft_entry__ as graft

pfn = graft._pipeline_fn(bpp=BPP, h=H, w=W, chroma_method=3)

def fused_body(ws):
    out, med = pfn(ws, gains)
    tap = ((out[:, :1, :1].astype(jnp.uint32) + med[:, None, None].astype(jnp.uint32)) & 1).astype(ws.dtype)
    return ws ^ jnp.pad(tap.reshape(B, 1), ((0, 0), (0, ws.shape[1] - 1)))

timeit_chain("fused unpack+defl+cs3x3+stripes", fused_body, words)
