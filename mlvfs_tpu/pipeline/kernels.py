"""The per-batch device pipeline: composition of processing ops.

Orchestration mirror of process_frame (main.c:908-1005), re-expressed as a
pure function over a batch of decoded frames. Order of operations preserved:

  decode → deflicker median → [pattern noise] → [dual-ISO] →
  [focus px, bad px (non-dual-ISO)] → [chroma smooth] → [stripes]

Per-clip calibration state mirrors the reference's caches and is computed at
the same pipeline position on the first batch: bad-pixel detection runs on
the frame as fix_bad_pixels sees it (cs.c:233-312), stripe gains on the fully
processed first frame (main.c:980-996, stripes.c:97-99).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import histogram as hist_ops
from .config import ProcessingConfig


@dataclasses.dataclass
class ClipCalibration:
    stripes_gains: np.ndarray = None  # (8,) fixed-point gains, FIXP_ONE = 65536
    stripes_needed: bool = False
    stripes_done: bool = False
    bad_pixel_list: np.ndarray = None  # (N, 2) x,y in sensor coords
    bad_pixels_done: bool = False
    focus_pixel_list: np.ndarray = None
    focus_done: bool = False
    dual_iso_rggb: bool = None  # Bayer order is per-clip; cache the first
    #                             batch's detection (saves a device round trip)
    dual_iso_white20: int = None  # the reconstruction's static white level,
    #                               fixed by the first converted batch — later
    #                               batches then run analysis + reconstruction
    #                               as one uninterrupted device dispatch chain


def calibrate_clip(fh, cfg: ProcessingConfig) -> ClipCalibration:
    """Static (data-independent) calibration: focus pixel map lookup."""
    cal = ClipCalibration()
    if cfg.fix_focus_pixels:
        from ..ops import pixels as pixel_ops

        ri = fh.raw_info
        cal.focus_pixel_list = pixel_ops.load_focus_pixel_map(
            int(fh.idnt["cameraModel"]), ri.width, ri.height, cfg.focus_pixel_dir
        )
    cal.focus_done = True
    return cal


def run_pipeline(imgs, fh, cfg: ProcessingConfig, cal: ClipCalibration, info: dict):
    """Apply the configured processing to a decoded batch (B, H, W) uint16."""
    ri = fh.raw_info
    black, white = ri.black_level, ri.white_level
    bpp = ri.bits_per_pixel
    crop_x = (int(fh.vidf["panPosX"]) + 7) & ~7
    crop_y = int(fh.vidf["panPosY"]) & ~1

    if cfg.deflicker:
        # deflicker target median → BaselineExposure tag (main.c:895-906)
        white_df = (1 << bpp) + 1
        medians = jax.jit(jax.vmap(lambda im: hist_ops.deflicker_median(im, white_df)))(imgs)
        medians = np.asarray(medians, np.float64)
        corr = np.log2((cfg.deflicker - black) / np.maximum(medians - black, 1e-9))
        info["exposure_bias"] = [(int(c * 10000), 10000) for c in corr]

    if cfg.fix_pattern_noise:
        from ..ops import patternnoise as pn_ops

        imgs = pn_ops.fix_pattern_noise_batch(imgs, white)

    okv = None  # per-frame dual-ISO conversion outcome (None: dual-ISO off)
    if cfg.dual_iso == 1:
        from ..ops import dualiso as di_ops

        imgs, ok = di_ops.hdr_preview_batch(imgs, fh, cal)
        okv = np.asarray(ok)
    elif cfg.dual_iso == 2:
        from ..ops import dualiso_full as dif_ops

        imgs, ok = dif_ops.cr2hdr20_batch(imgs, fh, cfg, cal)
        okv = np.asarray(ok)
    is_dual = okv is not None and bool(okv.any())
    if is_dual:
        # per-frame levels: frames that failed detection keep 14-bit levels
        info["levels"] = [
            ((black * 4, white * 4) if o else (black, white)) for o in okv
        ]
        info["black_level"] = black * 4
        info["white_level"] = white * 4

    if okv is None or not okv.all():
        # the reference's per-frame else-branch (main.c:966-973): every frame
        # whose dual-ISO conversion did not run (or failed detection) gets
        # normal-mode focus-pixel and bad-pixel fixes — including undetected
        # frames inside an otherwise-converted batch
        from ..ops import pixels as pixel_ops

        sel = None if okv is None or not okv.any() else ~okv
        fixed = imgs
        if cal.focus_pixel_list is not None and len(cal.focus_pixel_list):
            fixed = pixel_ops.fix_pixel_list_batch(
                fixed, cal.focus_pixel_list, black, crop_x, crop_y, dual_iso=False
            )
        if cfg.fix_bad_pixels:
            if not cal.bad_pixels_done:
                # detect on the first frame fix_bad_pixels actually sees —
                # in a mixed batch that is the first *undetected* frame
                # (the reference's per-GUID map comes from whichever frame
                # reaches fix_bad_pixels first, cs.c:233-312)
                i0 = 0 if sel is None else int(np.argmax(sel))
                cal.bad_pixel_list = pixel_ops.detect_bad_pixels(
                    np.asarray(fixed[i0]),
                    width=fh.xres,
                    height=fh.yres,
                    black=black,
                    aggressive=(cfg.fix_bad_pixels == 2),
                    crop_x=crop_x,
                    crop_y=crop_y,
                )
                cal.bad_pixels_done = True
            if cal.bad_pixel_list is not None and len(cal.bad_pixel_list):
                fixed = pixel_ops.fix_pixel_list_batch(
                    fixed, cal.bad_pixel_list, black, crop_x, crop_y, dual_iso=False
                )
        if sel is None:
            imgs = fixed
        else:
            imgs = jnp.where(jnp.asarray(sel)[:, None, None], fixed, imgs)

    if cfg.chroma_smooth and cfg.dual_iso != 2:
        from ..ops import chroma_smooth as cs_ops

        m = cfg.chroma_smooth
        if okv is None or not okv.any():
            imgs = cs_ops.chroma_smooth_batch(imgs, m, black)
        elif okv.all():
            imgs = cs_ops.chroma_smooth_batch(imgs, m, black * 4)
        else:
            # mixed batch: the reference smooths each frame under that
            # frame's (possibly x4) black level (main.c:975-978 runs on the
            # per-frame mutated header) — smooth under both, pick per frame.
            # (Two full-batch passes; mixed batches only occur on detection
            # failures, so the static-shape double pass beats compiling a
            # second gather/scatter program for the minority subset.)
            hi = cs_ops.chroma_smooth_batch(imgs, m, black * 4)
            lo = cs_ops.chroma_smooth_batch(imgs, m, black)
            imgs = jnp.where(jnp.asarray(okv)[:, None, None], hi, lo)

    if cfg.fix_stripes:
        from ..ops import stripes as stripes_ops

        # per-frame levels (main.c:980-996 runs on the per-frame mutated
        # header: a converted frame calibrates/applies at x4 levels)
        def _lv(o):
            return (black * 4, white * 4) if o else (black, white)

        if not cal.stripes_done:
            mixed = okv is not None and bool(okv.any()) and not bool(okv.all())
            if cfg.stripes_batch_cal and not mixed:
                # whole-first-batch device calibration: per-offset medians
                # via bisection whose counts all-reduce over the (sharded)
                # frame axis (ops/stripes.calibrate_batch_device)
                g_dev, needed_dev = stripes_ops.calibrate_batch_device(
                    imgs, info["black_level"], info["white_level"], int(ri.frame_size)
                )
                gains, needed = np.asarray(g_dev), bool(needed_dev)
            else:
                # (also the mixed-first-batch fallback: the batch device
                # calibration prices every frame at one (black, white)
                # pair, and a batch mixing converted x4 frames with
                # undetected 14-bit ones has no single correct pair —
                # frames at the wrong level would feed garbage samples
                # into the per-offset medians. The reference calibrates
                # from frame 0 under that frame's own levels.)
                # gains from the first processed frame only (stripes.c:97-99)
                b0, w0 = _lv(bool(okv[0])) if okv is not None else (
                    info["black_level"], info["white_level"])
                gains, needed = stripes_ops.compute_correction(
                    np.asarray(imgs[0]),
                    b0,
                    w0,
                    fh.xres,
                    frame_size_bytes=ri.frame_size,
                )
            cal.stripes_gains, cal.stripes_needed = gains, needed
            cal.stripes_done = True
        if cal.stripes_needed:
            gains = np.asarray(cal.stripes_gains)
            if okv is None or okv.all() or not okv.any():
                imgs = stripes_ops.apply_correction_batch(
                    imgs, gains, info["black_level"], info["white_level"]
                )
            else:  # mixed batch: apply under each frame's own levels
                hi = stripes_ops.apply_correction_batch(imgs, gains, black * 4, white * 4)
                lo = stripes_ops.apply_correction_batch(imgs, gains, black, white)
                imgs = jnp.where(jnp.asarray(okv)[:, None, None], hi, lo)

    return imgs, info
