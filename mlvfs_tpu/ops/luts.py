"""raw <-> EV integer lookup tables, bit-exact with the reference.

The whole processing pipeline works in "EV space": a fixed-point log2 of the
signal above black, at EV_RESOLUTION steps per stop. Two table families exist:

  - 14/16-bit tables (get_raw2ev / get_ev2raw, main.c:128-196) used by chroma
    smoothing and pixel fixing,
  - 20-bit tables (build_ev2raw_lut, hdr.c:839-874) used by the dual-ISO
    engine.

Bit-exactness notes (these feed the deterministic-parity gates):
  - C computes ``(int)(log2(i) * EV_RESOLUTION)`` which TRUNCATES toward zero;
    log2(0) = -inf casts to INT_MIN on x86 — we reproduce that value at
    index ``black`` exactly.
  - The 20-bit raw2ev uses round() (not truncation) and a symmetric
    log1p-style mapping below black.

Tables are cached per black level (the reference caches one and rebuilds under
a mutex when black changes; we just memoize — pure functional, no locks).
"""

from __future__ import annotations

import functools
import numpy as np

EV_RESOLUTION = 32768  # mlvfs.h:87
MAX_BLACK = 16384  # mlvfs.h:88
INT_MIN = -(2**31)


@functools.lru_cache(maxsize=16)
def raw2ev_lut(black: int, size: int = None) -> np.ndarray:
    """Integer raw→EV table indexed by raw value in [0, size).

    Matches get_raw2ev (main.c:154-179): value = trunc(log2(p - black) * EVR)
    for p > black, 0 for p < black, INT_MIN at p == black (C casts -inf).
    Default size covers the reachable range p in [0, 16384 + black).
    """
    if size is None:
        size = 16384 + black
    p = np.arange(size, dtype=np.int64)
    sig = p - black
    with np.errstate(divide="ignore", invalid="ignore"):
        ev = np.log2(np.maximum(sig, 1).astype(np.float64)) * EV_RESOLUTION
    out = np.where(sig > 0, np.trunc(ev), 0.0).astype(np.int64)
    out = np.where(sig == 0, INT_MIN, out)
    # above-table values in C would read out of bounds; clamp to last entry
    return out.astype(np.int32)


@functools.lru_cache(maxsize=1)
def raw2ev_lutf(black: int = 0, size: int = None) -> np.ndarray:
    """Float64 variant (get_raw2evf, main.c:128-152); -inf at p == black."""
    if size is None:
        size = 16384 + black
    p = np.arange(size, dtype=np.int64)
    sig = (p - black).astype(np.float64)
    with np.errstate(divide="ignore"):
        ev = np.log2(np.where(sig > 0, sig, 1)) * EV_RESOLUTION
    out = np.where(sig > 0, ev, 0.0)
    out = np.where(sig == 0, -np.inf, out)
    return out


@functools.lru_cache(maxsize=1)
def ev2raw_lut() -> np.ndarray:
    """EV→raw table over [-10*EVR, 14*EVR) shifted to index 0 (main.c:181-196).

    Entry j corresponds to EV index j - 10*EVR; value = (int)pow(2, ev/EVR).
    Callers index it as ``table[ev + 10*EVR]``.
    """
    i = np.arange(-10 * EV_RESOLUTION, 14 * EV_RESOLUTION, dtype=np.int64)
    vals = np.power(2.0, i.astype(np.float64) / EV_RESOLUTION)
    # C: (int)(pow(...)) truncates; float32 cast in C is (int)(float)pow? No:
    # ev2raw[i] = (int)(pow(2, (float)i / EV_RESOLUTION)) — pow result is double.
    return np.trunc(vals).astype(np.int64).clip(INT_MIN, 2**31 - 1).astype(np.int32)


def ev2raw_at(ev_idx):
    """Convenience: ev2raw for already-offset indices in [0, 14*EVR)."""
    return ev2raw_lut()[ev_idx + 10 * EV_RESOLUTION]


@functools.lru_cache(maxsize=8)
def _luts20(black: int, white: int):
    """20-bit raw2ev + ev2raw tables (build_ev2raw_lut, hdr.c:839-874).

    black/white here are 20-bit levels (14-bit levels * 64).
    Returns (raw2ev[1<<20] int32, ev2raw_0[24*EVR] int32); index ev2raw_0 by
    ``ev + 10*EVR``.
    """
    i = np.arange(1 << 20, dtype=np.int64)
    signal = np.maximum(i / 64.0 - black / 64.0, -1023.0)
    pos = np.round(np.log2(1 + np.abs(signal)) * EV_RESOLUTION)
    raw2ev = np.where(signal > 0, pos, -np.round(np.log2(1 - np.minimum(signal, 0)) * EV_RESOLUTION))
    raw2ev = raw2ev.astype(np.int32)

    j = np.arange(-10 * EV_RESOLUTION, 14 * EV_RESOLUTION, dtype=np.int64)
    ev2raw = np.empty(24 * EV_RESOLUTION, np.int64)
    neg = j < 0
    ev2raw[neg] = np.clip(
        black + 64 - np.round(64 * np.power(2.0, -j[neg] / EV_RESOLUTION)), 0, black
    )
    nonneg = ~neg
    vals = np.clip(
        black - 64 + np.round(64 * np.power(2.0, j[nonneg] / EV_RESOLUTION)),
        black,
        (1 << 20) - 1,
    )
    # for ev >= raw2ev[white], clamp up to at least white (hdr.c:861-864)
    thr = raw2ev[min(white, (1 << 20) - 1)]
    vals = np.where(j[nonneg] >= thr, np.maximum(vals, white), vals)
    ev2raw[nonneg] = vals
    ev2raw = ev2raw.astype(np.int32)
    # keep "bad" pixels: ev2raw[raw2ev[0]] = 0 (hdr.c:868)
    ev2raw[int(raw2ev[0]) + 10 * EV_RESOLUTION] = 0
    raw2ev.setflags(write=False)
    ev2raw.setflags(write=False)
    return raw2ev, ev2raw


def raw2ev_lut20(black: int, white: int) -> np.ndarray:
    return _luts20(black, white)[0]


def ev2raw_lut20(black: int, white: int) -> np.ndarray:
    return _luts20(black, white)[1]


@functools.lru_cache(maxsize=8)
def fullres_curve(black20: int) -> np.ndarray:
    """Fullres mixing curve over 20-bit values (build_fullres_curve, hdr.c:890-913)."""
    fullres_start, fullres_transition = 4.0, 4.0
    i = np.arange(1 << 20, dtype=np.float64)
    ev2 = np.log2(np.maximum(i / 64.0 - black20 / 64.0, 1.0))
    c2 = -np.cos(np.clip(ev2 - fullres_start, 0, fullres_transition) * np.pi / fullres_transition)
    return (c2 + 1) / 2


def mix_curve(black20: int, white20: int, corr_ev: float, overlap: float) -> np.ndarray:
    """Half-res blending curve (mix_images, hdr.c:1562-1571)."""
    max_ev = np.log2(white20 / 64 - black20 / 64)
    i = np.arange(1 << 20, dtype=np.float64)
    ev = np.log2(np.maximum(i / 64.0 - black20 / 64.0, 1.0)) + corr_ev
    c = -np.cos(np.clip(ev - (max_ev - overlap), 0, overlap) * np.pi / overlap)
    return (c + 1) / 2
