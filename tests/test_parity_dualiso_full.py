"""Full dual-ISO (cr2hdr 20-bit) path vs the reference, mean23 interpolation."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.ops import dualiso_full
from mlvfs_tpu.pipeline.config import ProcessingConfig

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")


def _dual_clip(tmp_path, phase=0, ev=3, seed=17, gbrg=False):
    spec = synth.SynthSpec(
        width=1280, height=960, frames=1, seed=seed, dual_iso=ev, dual_iso_phase=phase, gbrg=gbrg
    )
    img = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    path = str(tmp_path / "DI.MLV")
    synth.write_mlv(path, spec, frame_data=img[None])
    return MLVClip(path).frame_headers(0), spec, img


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(65535.0**2 / mse)


def _run(fh, img, cfg):
    out, ok = dualiso_full.cr2hdr20_batch(jnp.asarray(img[None]), fh, cfg, None)
    return np.asarray(out)[0], ok


@pytest.mark.parametrize(
    "phase,gbrg", [(0, False), (1, False), (2, False), (3, False), (0, True)]
)
def test_full_mean23_parity(tmp_path, phase, gbrg):
    fh, spec, img = _dual_clip(tmp_path, phase=phase, gbrg=gbrg)
    ref, ok, bl, wl = oracle.cr2hdr20(fh, img, interp=1, fullres=1, alias_map=1)
    assert ok
    assert (bl, wl) == (spec.black * 4, spec.white * 4)
    cfg = ProcessingConfig(dual_iso=2, hdr_interpolation_method=1)
    ours, okm = _run(fh, img, cfg)
    assert okm[0]
    assert _psnr(ref, ours) > 55, f"PSNR {_psnr(ref, ours):.1f}"
    # mismatching pixels are +-1-code EV-space rounding flips; the fraction
    # is backend-dependent (measured ~1% on CPU, ~2.6% on real TPU at
    # ~112 dB PSNR), so the gate allows the TPU float profile
    assert (ref != ours).mean() < 0.03


@pytest.mark.parametrize(
    "fullres,alias,cs",
    [(0, 1, 0), (1, 0, 0), (1, 1, 3), (0, 0, 5)],
)
def test_full_mean23_option_parity(tmp_path, fullres, alias, cs):
    fh, spec, img = _dual_clip(tmp_path)
    ref, ok, _, _ = oracle.cr2hdr20(fh, img, interp=1, fullres=fullres, alias_map=alias, cs_method=cs)
    assert ok
    cfg = ProcessingConfig(
        dual_iso=2,
        hdr_interpolation_method=1,
        hdr_no_fullres=not fullres,
        hdr_no_alias_map=not alias,
        chroma_smooth=cs,
    )
    ours, okm = _run(fh, img, cfg)
    assert okm[0]
    p = _psnr(ref, ours)
    # no-fullres blends the huge negative EV of pixel value 0 scaled by the
    # f32 fullres-curve lookup, amplifying f32-vs-f64 rounding; still far
    # inside the PSNR parity gate
    bound = 45 if not fullres else 55
    assert p > bound, f"PSNR {p:.1f} (fullres={fullres} alias={alias} cs={cs})"


def test_full_rejects_non_dual(tmp_path):
    fh, spec, img = _dual_clip(tmp_path, ev=0)
    ref, ok, _, _ = oracle.cr2hdr20(fh, img, interp=1)
    ours, okm = _run(fh, img, ProcessingConfig(dual_iso=2, hdr_interpolation_method=1))
    assert bool(okm[0]) == ok
    if not ok:
        np.testing.assert_array_equal(ours, img)


def test_alias_filter_pallas_matches_xla():
    """The VMEM-resident alias filter chain equals the XLA stages exactly
    (which are themselves inside the PSNR-gated oracle comparison)."""
    import jax.numpy as jnp
    from mlvfs_tpu.ops.dualiso_full import _alias_filter_xla
    from mlvfs_tpu.ops.alias_pallas import alias_filter

    rng = np.random.default_rng(11)
    for h, w in ((96, 256), (300, 256)):  # multi-chunk case: h > CORE via CORE patch
        alias = jnp.asarray(rng.integers(0, 20000, (h, w), dtype=np.int32))
        skip = jnp.asarray(rng.random((h, w)) < 0.2)
        want = np.asarray(_alias_filter_xla(alias, skip, h, w))
        got = np.asarray(alias_filter(alias, skip, h, w, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_alias_filter_pallas_multichunk():
    """Chunk-boundary rows agree with the single-frame XLA result."""
    import mlvfs_tpu.ops.alias_pallas as ap
    import jax.numpy as jnp
    from mlvfs_tpu.ops.dualiso_full import _alias_filter_xla

    old_core = ap.CORE
    ap.CORE = 64  # force several chunks at test size
    import jax

    jax.clear_caches()  # CORE is read at trace time, not part of the jit key
    try:
        rng = np.random.default_rng(12)
        h, w = 200, 256
        alias = jnp.asarray(rng.integers(0, 20000, (h, w), dtype=np.int32))
        skip = jnp.asarray(rng.random((h, w)) < 0.2)
        want = np.asarray(_alias_filter_xla(alias, skip, h, w))
        got = np.asarray(ap.alias_filter(alias, skip, h, w, interpret=True))
        np.testing.assert_array_equal(got, want)
    finally:
        ap.CORE = old_core
        jax.clear_caches()


def test_edge_pick_pallas_matches_xla():
    """The VMEM-resident edge scorer+pick equals the XLA form exactly."""
    import jax.numpy as jnp
    from mlvfs_tpu.ops.amaze import edge_pick_xla
    from mlvfs_tpu.ops.amaze_edge_pallas import edge_pick

    rng = np.random.default_rng(13)
    h, w = 120, 256
    evgray = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
    EW_a = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
    EW_b = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
    s = jnp.asarray(np.where(rng.random(h) < 0.5, -1, 1).astype(np.int32))
    restricted = jnp.asarray(rng.random((h, w)) < 0.3)
    want = np.asarray(edge_pick_xla(evgray, EW_a, EW_b, s, restricted, h, w))
    got = np.asarray(edge_pick(evgray, EW_a, EW_b, s, restricted, h, w, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_edge_pick_pallas_multichunk():
    import jax
    import jax.numpy as jnp
    import mlvfs_tpu.ops.amaze_edge_pallas as ep
    from mlvfs_tpu.ops.amaze import edge_pick_xla

    old = ep.CORE
    ep.CORE = 48
    jax.clear_caches()
    try:
        rng = np.random.default_rng(14)
        h, w = 150, 256
        evgray = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
        EW_a = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
        EW_b = jnp.asarray(rng.integers(-300000, 460000, (h, w), dtype=np.int32))
        s = jnp.asarray(np.where(rng.random(h) < 0.5, -1, 1).astype(np.int32))
        restricted = jnp.asarray(rng.random((h, w)) < 0.3)
        want = np.asarray(edge_pick_xla(evgray, EW_a, EW_b, s, restricted, h, w))
        got = np.asarray(ep.edge_pick(evgray, EW_a, EW_b, s, restricted, h, w, interpret=True))
        np.testing.assert_array_equal(got, want)
    finally:
        ep.CORE = old
        jax.clear_caches()
