"""Focus-pixel and bad-pixel correction.

Two halves, mapped to the hardware they fit best:

  * detection (bad pixels) — a one-time per-clip stencil reduce, vectorized
    NumPy on host over frame 0 (the reference also detects once per file GUID,
    cs.c:233-312);
  * correction — a static pixel list applied to every frame on device:
    gather the stencil neighborhoods for all N listed pixels at once,
    edge-weighted interpolation in EV space, scatter back. With the list
    static per clip, XLA compiles this into two fused gather/scatter ops.

Reference semantics: interpolate_horizontal / interpolate_vertical /
interpolate_pixel (cs.c:87-168), fix_bad_pixels (cs.c:220-331),
fix_focus_pixels + .fpm map loading (cs.c:355-503). Focus-pixel maps are the
plain-text "x y" calibration assets shipped with the reference
(mlvfs/data/*.fpm), bundled under mlvfs_tpu/data/.

Divergence note: the reference fixes pixels sequentially in map order, so a
fixed pixel can feed a later pixel's interpolation; we interpolate all pixels
from the *original* frame in parallel. Results differ only when two listed
pixels fall within each other's stencils.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .luts import EV_RESOLUTION, raw2ev_lut, ev2raw_lut

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@functools.lru_cache(maxsize=32)
def _load_fpm(path: str):
    pairs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                try:
                    pairs.append((int(parts[0], 0), int(parts[1], 0)))
                except ValueError:
                    continue
    return np.array(pairs, np.int32).reshape(-1, 2)


def load_focus_pixel_map(camera_id: int, rawi_width: int, rawi_height: int, fpm_dir: str = None):
    """Focus-pixel map for (camera, sensor crop), or None.

    File name pattern '%x_%ix%i.fpm' (cs.c:369). Searches the caller-supplied
    directory, the CWD (reference behavior), then the bundled data dir.
    """
    name = "%x_%ix%i.fpm" % (camera_id, rawi_width, rawi_height)
    for d in [fpm_dir, os.getcwd(), _DATA_DIR]:
        if d is None:
            continue
        path = os.path.join(d, name)
        if os.path.isfile(path):
            pixels = _load_fpm(path)
            return pixels if len(pixels) else None
    return None


def detect_bad_pixels(
    frame: np.ndarray,
    width: int,
    height: int,
    black: int,
    aggressive: bool,
    crop_x: int,
    crop_y: int,
) -> np.ndarray:
    """Auto-detect cold/hot pixels on one frame → (N, 2) sensor coords.

    cr2hdr-derived rules (cs.c:255-306): cold = below black - 8*noise;
    hot = more than 2 EV above the 2nd-max of the 8 same-color neighbors;
    aggressive adds a 1 EV test against the 2nd and 3rd max.
    """
    img = np.asarray(frame, np.int32)
    h, w = img.shape
    assert (h, w) == (height, width)
    dark_noise = 12  # fixed guess, cs.c:256
    dark_min = black - dark_noise * 8
    dark_max = black + dark_noise * 8

    # 8 same-color neighbors at offsets {-2,0,2}^2 \ origin, interior window
    ys = slice(6, h - 6)
    xs = slice(6, w - 6)
    center = img[ys, xs]
    neigh = np.stack(
        [
            img[6 + dy : h - 6 + dy, 6 + dx : w - 6 + dx]
            for dy in (-2, 0, 2)
            for dx in (-2, 0, 2)
            if not (dy == 0 and dx == 0)
        ]
    )
    # top-3 neighbor values; reference tracks maxima of negated values seeded
    # with 0, so values clamp at >= 0 (pixels are non-negative anyway)
    part = -np.partition(-neigh, 2, axis=0)[:3]
    max2, max3 = part[1], part[2]

    lut = raw2ev_lut(black)
    ev = lut[np.minimum(center, len(lut) - 1)]
    ev_max2 = lut[np.minimum(max2, len(lut) - 1)]
    cold = center < dark_min
    hot = (ev - ev_max2 > 2 * EV_RESOLUTION) & (center > dark_max)
    bad = cold | hot
    if aggressive:
        ev_max3 = lut[np.minimum(max3, len(lut) - 1)]
        bad |= ((ev - ev_max2 > EV_RESOLUTION) | (ev - ev_max3 > EV_RESOLUTION)) & (
            center > dark_max
        )

    yy, xx = np.nonzero(bad)
    # scan order (y, then x) matches the reference's loop order
    return np.stack([xx + 6 + crop_x, yy + 6 + crop_y], axis=1).astype(np.int32)


def _ev_tables(black: int, device=False):
    lut = raw2ev_lut(black, size=1 << 16)  # index by any uint16 value
    inv = ev2raw_lut()
    return jnp.asarray(lut), jnp.asarray(inv)


def _interp_weights2(d1, d2):
    """(sum-d)<<8 / sum fixed-point weights of interpolate_horizontal/vertical.

    Exact C int32 semantics: the d's are ABS of wrapped differences and can
    be NEGATIVE when a gradient neighbor sits exactly at black (raw2ev =
    INT_MIN, and C's ABS(INT_MIN) wraps back to INT_MIN); the reference
    only short-circuits sum == 0 and otherwise divides by the possibly
    negative sum with C's truncating `/` (cs.c:96-103). lax.div is that
    truncating division."""
    s = d1 + d2
    safe = jnp.where(s == 0, 1, s)
    c1 = jnp.where(s == 0, 0, jax.lax.div((s - d1) << 8, safe))
    c2 = jnp.where(s == 0, 0, jax.lax.div((s - d2) << 8, safe))
    return s, c1, c2


def build_pixel_fixer(
    pixel_list: np.ndarray,
    height: int,
    width: int,
    black: int,
    crop_x: int,
    crop_y: int,
    dual_iso: bool,
):
    """Compile-time specialization: returns fn(img_u16[H,W]) -> fixed img.

    The list and geometry are static; the returned function is pure and
    jit/vmap-friendly.
    """
    pl = np.asarray(pixel_list, np.int64)
    x = pl[:, 0] - crop_x
    y = pl[:, 1] - crop_y
    flat = x + y * width
    interior = (x > 2) & (x < width - 3) & (y > 2) & (y < height - 3)
    inbounds = (flat > 0) & (flat < width * height)
    horizontal_edge = ((x >= width - 3) & (x < width)) | ((x >= 0) & (x <= 3))
    vertical_edge = ((y >= height - 3) & (y < height)) | ((y >= 0) & (y <= 3))

    def fix(img: jnp.ndarray, lut: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
        f = img.reshape(-1).astype(jnp.int32)

        def at(offset):
            idx = jnp.clip(flat + offset, 0, height * width - 1)
            return f[idx]

        def ev(v):
            return lut[jnp.clip(v, 0, (1 << 16) - 1)]

        def ev2raw(e):
            e = jnp.clip(e, 0, 14 * EV_RESOLUTION - 1)
            return inv[e + 10 * EV_RESOLUTION] + black

        # horizontal stencil (cs.c:87-108)
        dh1 = jnp.abs(ev(at(3)) - ev(at(1)))
        dh2 = jnp.abs(ev(at(-1)) - ev(at(-3)))
        sh, ch1, ch2 = _interp_weights2(dh1, dh2)
        ev_h = ((ev(at(2)) * ch1) >> 8) + ((ev(at(-2)) * ch2) >> 8)
        horiz = jnp.where(sh == 0, at(2), ev2raw(ev_h))

        # vertical stencil (cs.c:110-131)
        w_ = width
        dv1 = jnp.abs(ev(at(3 * w_)) - ev(at(w_)))
        dv2 = jnp.abs(ev(at(-w_)) - ev(at(-3 * w_)))
        sv, cv1, cv2 = _interp_weights2(dv1, dv2)
        ev_v = ((ev(at(2 * w_)) * cv1) >> 8) + ((ev(at(-2 * w_)) * cv2) >> 8)
        vert = jnp.where(sv == 0, at(2 * w_), ev2raw(ev_v))

        # combined 4-direction stencil (cs.c:133-168); same exact-C division
        # semantics as _interp_weights2 (sum may be negative via INT_MIN)
        s4 = dh1 + dh2 + dv1 + dv2
        s4c = jnp.where(s4 == 0, 1, 3 * s4)
        cv1f = jax.lax.div((s4 - dv1) << 8, s4c)
        cv2f = jax.lax.div((s4 - dv2) << 8, s4c)
        ch1f = jax.lax.div((s4 - dh1) << 8, s4c)
        ch2f = jax.lax.div((s4 - dh2) << 8, s4c)
        ev_4 = (
            ((ev(at(2 * w_)) * cv1f) >> 8)
            + ((ev(at(-2 * w_)) * cv2f) >> 8)
            + ((ev(at(2)) * ch1f) >> 8)
            + ((ev(at(-2)) * ch2f) >> 8)
        )
        four = jnp.where(s4 == 0, at(2), ev2raw(ev_4))

        if dual_iso:
            interior_val = horiz
        else:
            interior_val = four

        # edge handling (fix_focus_pixels, cs.c:479-500)
        h_only = horizontal_edge & ~vertical_edge if not dual_iso else np.zeros_like(horizontal_edge)
        v_only = vertical_edge & ~horizontal_edge
        edge_val = at(0)
        edge_val = jnp.where(h_only, vert, edge_val)
        edge_val = jnp.where(v_only, horiz, edge_val)
        only_h = ~h_only & ~v_only
        edge_val = jnp.where(only_h & (x >= 0) & (x <= 3), at(2), edge_val)
        edge_val = jnp.where(only_h & (x >= width - 3) & (x < width), at(-2), edge_val)

        value = jnp.where(interior, interior_val, jnp.where(inbounds, edge_val, at(0)))
        tgt = jnp.where(inbounds, flat, 0)
        keep = jnp.where(inbounds, value, f[0]).astype(img.dtype)
        out = img.reshape(-1).at[tgt].set(keep.astype(img.dtype), mode="drop")
        # pixels with idx 0 used as dummy target must not clobber pixel 0
        if not bool(inbounds.all()):
            out = out.at[0].set(img.reshape(-1)[0])
        return out.reshape(height, width)

    return fix


_fixer_cache = {}


def fix_pixel_list_batch(imgs, pixel_list, black, crop_x, crop_y, dual_iso: bool):
    """Apply a (focus or bad) pixel list to a batch (B, H, W) on device.

    The compiled fixer is cached per (pixel list, geometry, config) so
    repeated batches of the same clip reuse one executable.
    """
    if pixel_list is None or len(pixel_list) == 0:
        return imgs
    b, h, w = imgs.shape
    pl = np.ascontiguousarray(pixel_list, np.int64)
    key = (pl.tobytes(), h, w, int(black), int(crop_x), int(crop_y), bool(dual_iso))
    fn = _fixer_cache.get(key)
    if fn is None:
        fixer = build_pixel_fixer(pl, h, w, int(black), int(crop_x), int(crop_y), bool(dual_iso))
        fn = jax.jit(jax.vmap(fixer, in_axes=(0, None, None)))
        _fixer_cache[key] = fn
    lut = jnp.asarray(np.asarray(raw2ev_lut(int(black), size=1 << 16)))
    inv = jnp.asarray(np.asarray(ev2raw_lut()))
    return fn(imgs, lut, inv)
