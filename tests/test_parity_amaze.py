"""AMaZE demosaic core + amaze-edge dual-ISO path vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.ops.amaze_core import amaze_demosaic
from mlvfs_tpu.ops import dualiso_full
from mlvfs_tpu.pipeline.config import ProcessingConfig

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")


def _psnr(a, b, peak=65535.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(peak * peak / mse)


def test_amaze_core_parity(rng):
    h, w = 160, 224
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 8000 + 6000 * np.sin(x / 9.0) * np.cos(y / 11.0) + 3000 * (x / w)
    gains = np.array([[0.8, 1.0], [1.0, 0.6]])
    img = np.clip(
        base * gains[y.astype(int) % 2, x.astype(int) % 2] + rng.normal(0, 30, (h, w)),
        0,
        65535,
    ).astype(np.float32)

    rr, gg, bb = oracle.amaze(img)
    r2, g2, b2 = jax.jit(amaze_demosaic)(jnp.asarray(img))
    # interior comparison: the 16px frame corners use the reference's
    # off-by-16 corner mirror, a documented divergence
    sl = (slice(20, -20), slice(20, -20))
    for name, a, b in [("R", rr, r2), ("G", gg, g2), ("B", bb, b2)]:
        p = _psnr(a[sl], np.asarray(b)[sl])
        assert p > 70, f"{name} plane PSNR {p:.1f}"


def test_amaze_edge_dualiso_parity(tmp_path):
    spec = synth.SynthSpec(width=1280, height=960, frames=1, seed=17, dual_iso=3)
    img = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    path = str(tmp_path / "DI.MLV")
    synth.write_mlv(path, spec, frame_data=img[None])
    fh = MLVClip(path).frame_headers(0)

    ref, ok, bl, wl = oracle.cr2hdr20(fh, img, interp=0, fullres=1, alias_map=1)
    assert ok
    cfg = ProcessingConfig(dual_iso=2, hdr_interpolation_method=0)
    out, okm = dualiso_full.cr2hdr20_batch(jnp.asarray(img[None]), fh, cfg, None)
    assert okm[0]
    p = _psnr(ref, np.asarray(out)[0])
    assert p > 60, f"amaze-edge PSNR {p:.1f}"


def _natural_frame(rng, h, w, gains):
    """Natural-statistics mosaic: 1/f spectrum (smooth regions + edges at all
    scales), plus hard occlusion edges and shot-like noise — pins the raster
    passes' behavior on imagery they were designed for (VERDICT r1 #9)."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    amp = 1.0 / np.maximum(np.hypot(fy, fx), 1.0 / max(h, w))
    spec = amp * np.exp(2j * np.pi * rng.random((h, w)))
    img = np.real(np.fft.ifft2(spec))
    img = (img - img.min()) / (img.max() - img.min())
    # occlusion edges: a bright diagonal band and a dark rectangle
    y, x = np.mgrid[0:h, 0:w]
    img = np.where((x + 2 * y) % 97 < 18, img * 0.25 + 0.7, img)
    img[h // 3 : h // 2, w // 4 : w // 2] *= 0.15
    base = 1500 + img * 12000
    mosaic = base * gains[y % 2, x % 2]
    mosaic += rng.normal(0, np.sqrt(np.maximum(mosaic, 1)) * 0.5)
    return np.clip(mosaic, 0, 65535).astype(np.float32)


def test_amaze_core_parity_natural(rng):
    h, w = 320, 352  # multiple scan tiles vertically at the padded size
    gains = np.array([[0.85, 1.0], [1.0, 0.55]])
    img = _natural_frame(rng, h, w, gains)
    rr, gg, bb = oracle.amaze(img)
    r2, g2, b2 = jax.jit(amaze_demosaic)(jnp.asarray(img))
    sl = (slice(20, -20), slice(20, -20))
    # the frame-wide stencils/raster chains diverge from the reference's
    # 160x160 per-tile recomputation more on natural content than on the
    # smooth synthetic frame (measured ~66 dB R plane vs ~94 dB there);
    # the divergence is seam-free (no tile boundaries) and pinned here
    for name, a, b in [("R", rr, r2), ("G", gg, g2), ("B", bb, b2)]:
        p = _psnr(a[sl], np.asarray(b)[sl])
        assert p > 60, f"{name} plane PSNR {p:.1f} (natural-statistics frame)"
