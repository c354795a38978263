"""Per-frame dual-ISO gating on mixed batches vs per-frame reference processing.

The reference decides is_dual_iso per frame and routes undetected frames
through the normal-mode focus/bad-pixel else-branch (main.c:951-973). A batch
mixing detected and undetected preview frames must reproduce that per frame:
byte parity on the undetected frame's else-branch output, the preview PSNR
contract on the detected frame, per-frame levels in the header info.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.pipeline import kernels
from mlvfs_tpu.pipeline.config import ProcessingConfig

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")

W, H = 1280, 960  # preview-fit geometry (see tests/test_parity_dualiso_preview.py)
CAMERA = 0x99880011  # fresh (camera, crop) key: the reference's focus-map
#                      cache is static first-load-wins (cs.c:421)


def _mixed_clip(tmp_path, guid=0x5151AA00BB77CC01):
    rng = np.random.default_rng(2024)
    spec_d = synth.SynthSpec(
        width=W, height=H, frames=2, seed=7, dual_iso=3, dual_iso_phase=0,
        camera_model=CAMERA, guid=guid,
    )
    img_dual = synth.make_frame_data(spec_d, np.random.default_rng(spec_d.seed))
    spec_n = synth.SynthSpec(width=W, height=H, frames=2, seed=8, camera_model=CAMERA)
    img_norm = synth.make_frame_data(spec_n, np.random.default_rng(spec_n.seed))
    # injected bad pixels, spread far apart (non-interacting fixes contract)
    pts = [(101, 203), (400, 800), (707, 415), (850, 1101)]
    for i, (y, x) in enumerate(pts):
        img_norm[y, x] = 100 if i % 2 else 16200
    path = str(tmp_path / "MIX.MLV")
    synth.write_mlv(path, spec_d, frame_data=np.stack([img_dual, img_norm]))
    # focus-pixel map for this (camera, crop)
    fpm = os.path.join(str(tmp_path), "%x_%ix%i.fpm" % (CAMERA, W, H))
    with open(fpm, "w") as f:
        for x, y in [(64, 64), (321, 200), (1000, 555)]:
            f.write(f"{x} {y}\n")
    return path, img_dual, img_norm, spec_d


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(65535.0**2 / mse)


def test_mixed_preview_batch_matches_per_frame_reference(tmp_path):
    path, img_dual, img_norm, spec = _mixed_clip(tmp_path)
    cfg = ProcessingConfig(
        dual_iso=1, fix_bad_pixels=1, focus_pixel_dir=str(tmp_path), batch_size=2
    )
    with MLVClip(path) as clip:
        fh0 = clip.frame_headers(0)
        fh1 = clip.frame_headers(1)

    # reference, frame by frame (process_frame, main.c:951-973)
    ref0, ok0, bl0, wl0 = oracle.hdr_preview(fh0, img_dual, cwd=str(tmp_path))
    assert ok0, "reference must detect the dual-ISO frame"
    assert (bl0, wl0) == (spec.black * 4, spec.white * 4)
    ref1, ok1, _, _ = oracle.hdr_preview(fh1, img_norm, cwd=str(tmp_path))
    assert not ok1, "reference must reject the normal frame"
    np.testing.assert_array_equal(ref1, img_norm)  # rejection leaves data alone
    # else-branch: normal-mode focus fixes, then bad-pixel detect+fix
    ref1 = oracle.fix_focus_pixels(fh1, ref1, dual_iso=0, cwd=str(tmp_path))
    ref1 = oracle.fix_bad_pixels(fh1, ref1, aggressive=0, dual_iso=0)

    # ours: one batch through the orchestrator
    cal = kernels.calibrate_clip(fh0, cfg)
    info = {
        "black_level": spec.black,
        "white_level": spec.white,
        "exposure_bias": None,
    }
    imgs = jnp.asarray(np.stack([img_dual, img_norm]))
    out, info = kernels.run_pipeline(imgs, fh0, cfg, cal, info)
    out = np.asarray(out)

    # per-frame levels: converted frame x4, undetected frame untouched
    assert info["levels"][0] == (spec.black * 4, spec.white * 4)
    assert info["levels"][1] == (spec.black, spec.white)

    # undetected frame: byte parity with the reference else-branch
    np.testing.assert_array_equal(out[1], ref1)

    # detected frame: the preview parity contract (fit in different float
    # widths; gates mirror tests/test_parity_dualiso_preview.py)
    assert (ref0 != out[0]).mean() < 0.02
    assert _psnr(ref0, out[0]) > 60


def test_mixed_full_batch_matches_per_frame_reference(tmp_path):
    """dual_iso=2 (cr2hdr20) mixed batch vs per-frame reference processing.

    Two contracts the batch path must keep (both from the composed chain,
    main.c:951-973 + hdr.c:1932-1956):
    - a frame failing hdr_check leaves cr2hdr20 UNTOUCHED (the dual-mode
      focus/bad fixes sit inside `if (hdr_check(...))`), then takes the
      normal-mode else-branch — byte parity required;
    - ONE bad-pixel map per clip, detected from the first frame that
      reaches fix_bad_pixels (cs.c:233-312): here frame 0 through the dual
      path. The planted bad pixels live in frame 1 only, so the per-clip
      map (from clean frame 0) must NOT fix them — detecting from frame 1
      (the pre-r5 behavior) fixes them and diverges.
    """
    # fresh GUID: the oracle's per-(GUID, aggressive) map cache is static
    # per process, and this test's contract IS that cache's provenance
    path, img_dual, img_norm, spec = _mixed_clip(tmp_path, guid=0x5151AA00BB77CC02)
    cfg = ProcessingConfig(
        dual_iso=2, hdr_interpolation_method=1, fix_bad_pixels=1,
        focus_pixel_dir=str(tmp_path), batch_size=2,
    )
    with MLVClip(path) as clip:
        fh0 = clip.frame_headers(0)
        fh1 = clip.frame_headers(1)

    # reference, frame by frame through the composed chain — in frame
    # order, so the per-GUID map comes from frame 0 (dual path)
    ref0, _, is_dual0, _, _ = oracle.process_frame(
        fh0, img_dual, dual_iso=2, interp=1, bad_pix=1, cwd=str(tmp_path)
    )
    assert is_dual0, "reference must convert the dual-ISO frame"
    ref1, _, is_dual1, _, _ = oracle.process_frame(
        fh1, img_norm, dual_iso=2, interp=1, bad_pix=1, cwd=str(tmp_path)
    )
    assert not is_dual1, "reference must reject the normal frame"
    # the frame-0 map must be empty-ish: frame 1's planted pixels survive
    assert ref1[101, 203] == img_norm[101, 203]

    cal = kernels.calibrate_clip(fh0, cfg)
    info = {"black_level": spec.black, "white_level": spec.white, "exposure_bias": None}
    imgs = jnp.asarray(np.stack([img_dual, img_norm]))
    out, info = kernels.run_pipeline(imgs, fh0, cfg, cal, info)
    out = np.asarray(out)

    assert info["levels"][0] == (spec.black * 4, spec.white * 4)
    assert info["levels"][1] == (spec.black, spec.white)

    # undetected frame: byte parity (untouched by cr2hdr20, else-branch
    # fixes only, shared per-clip map)
    np.testing.assert_array_equal(out[1], ref1)

    # converted frame: the full-path PSNR contract (mean23 gate mirrors
    # tests/test_parity_dualiso_full.py)
    assert _psnr(ref0, out[0]) > 55


def test_mixed_batch_stripes_batch_cal_falls_back_to_frame0(tmp_path):
    """--stripes-batch-cal on a mixed first batch falls back to frame-0
    calibration: the device batch calibration prices every frame at one
    (black, white) pair, which a batch mixing x4-converted and 14-bit
    frames does not have — the fallback must produce exactly the
    reference's frame-0 gains (stripes.c:97-99)."""
    path, img_dual, img_norm, spec = _mixed_clip(tmp_path, guid=0x5151AA00BB77CC03)
    with MLVClip(path) as clip:
        fh0 = clip.frame_headers(0)
    outs, cals = [], []
    for batch_cal in (False, True):
        cfg = ProcessingConfig(
            dual_iso=1, fix_stripes=True, stripes_batch_cal=batch_cal,
            focus_pixel_dir=str(tmp_path), batch_size=2,
        )
        cal = kernels.calibrate_clip(fh0, cfg)
        info = {"black_level": spec.black, "white_level": spec.white,
                "exposure_bias": None}
        out, _ = kernels.run_pipeline(
            jnp.asarray(np.stack([img_dual, img_norm])), fh0, cfg, cal, info
        )
        outs.append(np.asarray(out))
        cals.append(cal)
    assert cals[0].stripes_needed == cals[1].stripes_needed
    np.testing.assert_array_equal(
        np.asarray(cals[0].stripes_gains), np.asarray(cals[1].stripes_gains)
    )
    np.testing.assert_array_equal(outs[0], outs[1])


def test_mixed_batch_chroma_and_stripes_levels(tmp_path):
    """Chroma smoothing and stripe apply use each frame's own levels in a
    mixed batch (the reference runs them on the per-frame mutated header,
    main.c:975-996)."""
    path, img_dual, img_norm, spec = _mixed_clip(tmp_path)
    cfg = ProcessingConfig(
        dual_iso=1, chroma_smooth=2, fix_stripes=True,
        focus_pixel_dir=str(tmp_path), batch_size=2,
    )
    with MLVClip(path) as clip:
        fh0 = clip.frame_headers(0)
        fh1 = clip.frame_headers(1)

    # reference per frame: frame 0 converts (header mutates to x4) then
    # chroma+stripes at x4; frame 1 rejects, else-branch focus fixes, then
    # chroma+stripes at 14-bit levels. Stripes calibrate from frame 0.
    ref0, ok0, _, _ = oracle.hdr_preview(fh0, img_dual, cwd=str(tmp_path))
    assert ok0
    ref1 = oracle.fix_focus_pixels(fh1, img_norm, dual_iso=0, cwd=str(tmp_path))
    ref1 = oracle.chroma_smooth(fh1, ref1, 2)

    cal = kernels.calibrate_clip(fh0, cfg)
    info = {"black_level": spec.black, "white_level": spec.white, "exposure_bias": None}
    imgs = jnp.asarray(np.stack([img_dual, img_norm]))
    out, info = kernels.run_pipeline(imgs, fh0, cfg, cal, info)
    out = np.asarray(out)

    # apply the frame-0-calibrated gains to the reference else-branch frame
    # at ITS levels — our frame 1 must match byte-for-byte
    from mlvfs_tpu.ops import stripes as stripes_ops

    if cal.stripes_needed:
        ref1 = np.asarray(
            stripes_ops.apply_correction_batch(
                jnp.asarray(ref1[None]), np.asarray(cal.stripes_gains),
                spec.black, spec.white,
            )
        )[0]
    np.testing.assert_array_equal(out[1], ref1)
