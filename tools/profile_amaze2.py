"""Bisect amaze_edge_interpolate: cumulative stages to find the 1.4s/frame."""

import time
import sys
import math

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.ops import amaze as amz
from mlvfs_tpu.ops.amaze import _sh, _tdiv, _srow_shift, EDGE_DIRECTIONS, D0, SEARCH_AREA, squeeze_rows
from mlvfs_tpu.ops.amaze_core import amaze_demosaic
from mlvfs_tpu.ops import evmath

H, W, B = 960, 1280, 8
BLACK = 2048
black20, white20 = BLACK * 64, 10000 * 64
white_ev = int(round(math.log2(white20 / 64.0 - black20 / 64.0) * 32768))
white_darkened = white20

spec = synth.SynthSpec(width=W, height=H, frames=1, dual_iso=3, seed=3)
rng = np.random.default_rng(3)
frame = synth.make_frame_data(spec, rng)
imgs = jnp.asarray(np.broadcast_to(frame, (B, H, W)).copy())
raw20 = imgs.astype(jnp.int32) << 6

row_bright = jnp.asarray(np.tile((np.arange(H) % 4) >= 2, (B, 1)))
s = jnp.asarray(np.where((np.arange(H) % 4 == 1) | (np.arange(H) % 4 == 3), 1, -1)[None].repeat(B, 0), np.int32)


def ev_of(x):
    return evmath.raw2ev20(x, black20)


def ev2raw_at(x):
    return evmath.ev2raw20(x, black20, white20, white_ev)


def frcurve_of(x):
    return evmath.fullres_weight(x, black20)


def timeit(name, fn, *args, iters=4):
    f = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = f(c, *args)
    float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/frame", flush=True)


def stage(upto):
    def one(raw, rb, si):
        h, w = raw.shape
        squeezed = squeeze_rows(rb, h)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        green_site = (xx % 2) != (yy % 2)
        scaled = jnp.where(green_site, _tdiv(raw - black20, 2) + black20, raw)
        inv = jnp.zeros(h, jnp.int32).at[squeezed].set(jnp.arange(h, dtype=jnp.int32))
        sq_img = scaled.astype(jnp.float32)[inv]
        red, grn, blu = amaze_demosaic(sq_img)
        if upto == 1:
            return red + grn + blu
        grn = jnp.clip((grn - black20) * 2.0 + black20, 0, 0xFFFFF)
        red = jnp.clip(red, 0, 0xFFFFF)
        blu = jnp.clip(blu, 0, 0xFFFFF)
        U_r = red[squeezed]
        U_g = grn[squeezed]
        U_b = blu[squeezed]
        gray = (U_g / 2.0 + U_r / 4.0 + U_b / 4.0).astype(jnp.int32)
        evgray = ev_of(gray)
        if upto == 2:
            return evgray.astype(jnp.float32)
        T = {
            2: _srow_shift(evgray, si, 2, 0),
            1: _srow_shift(evgray, si, 1, 0),
            -2: _srow_shift(evgray, -si, 2, 0),
            -3: _srow_shift(evgray, -si, 3, 0),
        }

        def box11(d):
            c = jnp.cumsum(d, axis=-1)
            return _sh(c, 0, SEARCH_AREA) - _sh(c, 0, -SEARCH_AREA - 1)

        e_all = []
        for (ack, a, b, bck) in EDGE_DIRECTIONS:
            p1 = _sh(T[ack[1]], 0, ack[0])
            p2 = _sh(T[a[1]], 0, a[0])
            p3 = _sh(T[b[1]], 0, b[0])
            p4 = _sh(T[bck[1]], 0, bck[0])
            d = jnp.abs(p1 - p2) + jnp.abs(p2 - p3) + jnp.abs(p3 - p4)
            e_all.append(box11(d))
        e_stack = jnp.stack(e_all)
        penalty = jnp.asarray(
            [abs(d - D0) * 32768 // 8 for d in range(len(EDGE_DIRECTIONS))], jnp.int32
        )
        scores = e_stack + penalty[:, None, None]
        d_best = jnp.argmin(scores, axis=0).astype(jnp.int32)
        fc = frcurve_of(raw)
        rb2 = rb[:, None]
        restricted = jnp.where(rb2, raw < white_darkened, fc > amz.FULLRES_THR)
        d_best = jnp.where(restricted, D0, d_best)
        window = (yy >= 5) & (yy < h - 5) & (xx >= 5) & (xx < w - 5)
        d_best = jnp.where(window, d_best, D0)
        if upto == 3:
            return d_best.astype(jnp.float32)
        red_mask = (yy % 2 == 0) & (xx % 2 == 0)
        blue_mask = (yy % 2 == 1) & (xx % 2 == 1)

        def ev_class(dy_units):
            sel = [
                _srow_shift(U, si * int(np.sign(dy_units)), abs(dy_units), 0)
                for U in (U_r, U_g, U_b)
            ]
            v = jnp.where(red_mask, sel[0], jnp.where(blue_mask, sel[2], sel[1]))
            return ev_of(jnp.clip(jnp.trunc(v), 0, 0xFFFFF).astype(jnp.int32))

        EW_a = ev_class(1)
        EW_b = ev_class(-2)
        pi_all = []
        for (ack, a, b, bck) in EDGE_DIRECTIONS:
            eva = _sh(EW_a, 0, a[0])
            evb = _sh(EW_b, 0, b[0])
            pi_all.append(_tdiv(eva * 2 + evb, 3))
        pi_stack = jnp.stack(pi_all)
        if upto == 4:
            return pi_stack.sum(0).astype(jnp.float32)
        nd = len(EDGE_DIRECTIONS)

        def pick(idx):
            acc = pi_stack[0]
            for d in range(1, nd):
                acc = jnp.where(idx == d, pi_stack[d], acc)
            return acc

        pi0 = pick(d_best)
        pip = pick(jnp.minimum(d_best + 1, nd - 1))
        pim = pick(jnp.maximum(d_best - 1, 0))
        interp_val = ev2raw_at(_tdiv(2 * pi0 + pip + pim, 4))
        return interp_val.astype(jnp.float32)

    def fn(c, raw, rb, si):
        o = jax.vmap(one)(raw, rb, si)
        return c + o.sum(dtype=jnp.float32) * 1e-9

    return fn


print("devices:", jax.devices(), flush=True)
for u, name in [(1, "squeeze+demosaic"), (2, "+desqueeze+evgray"), (3, "+scorer/d_best"),
                (4, "+ev_class+pi_stack"), (5, "+pick+ev2raw (full)")]:
    timeit(f"upto {u}: {name}", stage(u), raw20, row_bright, s)
