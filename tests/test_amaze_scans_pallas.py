"""Pallas raster-pass kernels must be numerically equivalent to the XLA
lax.scan formulations in amaze_core (which carry the PSNR parity gates
against the reference C).

Runs the Pallas kernels in interpreter mode on the CPU test mesh. The
bottom 16 padded rows are excluded: the XLA scans read rows following the
tile from the rolled frame while the in-VMEM kernels zero them — those rows
are inside the reflect apron that amaze_demosaic crops, so the final
outputs agree everywhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mlvfs_tpu.ops import amaze_core as core
from mlvfs_tpu.ops import amaze_scans_pallas as sp


HP, WP = 192 + 32, 160 + 32  # 2 scan tiles, non-128-multiple lane count


def _crop(a):
    return np.asarray(a)[: HP - 16]


def test_refine_matches_xla(rng):
    wt = jnp.asarray(rng.random((HP, WP), np.float32))
    ref = core._neighbor_refine_scan.__wrapped__(wt, HP, WP) if hasattr(
        core._neighbor_refine_scan, "__wrapped__") else None
    import os

    os.environ["MLVFS_AMAZE_PALLAS"] = "0"
    try:
        ref = core._neighbor_refine_scan(wt, HP, WP)
    finally:
        del os.environ["MLVFS_AMAZE_PALLAS"]
    got = sp.refine_pallas(wt, HP, WP, interpret=True)
    np.testing.assert_allclose(_crop(got), _crop(ref), rtol=0, atol=1e-6)


def test_dilate_matches_xla(rng):
    nyq = jnp.asarray((rng.random((HP, WP)) > 0.6).astype(np.int32))
    yy = np.arange(HP)[:, None]
    xx = np.arange(WP)[None, :]
    rbmask = jnp.asarray(((yy + xx) % 2) == 0)
    import os

    os.environ["MLVFS_AMAZE_PALLAS"] = "0"
    try:
        ref = core._nyquist_dilate(nyq, rbmask, HP, WP)
    finally:
        del os.environ["MLVFS_AMAZE_PALLAS"]
    got = sp.dilate_pallas(nyq, HP, WP, interpret=True)
    np.testing.assert_array_equal(_crop(got), _crop(ref))


def test_chroma_matches_xla(rng):
    D0 = jnp.asarray(rng.normal(0, 0.1, (HP, WP)).astype(np.float32))
    D1 = jnp.asarray(rng.normal(0, 0.1, (HP, WP)).astype(np.float32))
    yy = np.arange(HP)[:, None]
    xx = np.arange(WP)[None, :]
    bsite = jnp.asarray(((yy % 2) == 1) & ((xx % 2) == 1))
    rbmask = jnp.asarray(((yy + xx) % 2) == 0)
    import os

    os.environ["MLVFS_AMAZE_PALLAS"] = "0"
    try:
        ref0, ref1 = core._chroma_smooth_scan(D0, D1, bsite, rbmask, HP, WP)
    finally:
        del os.environ["MLVFS_AMAZE_PALLAS"]
    got0, got1 = sp.chroma_pallas(D0, D1, HP, WP, interpret=True)
    np.testing.assert_allclose(_crop(got0), _crop(ref0), rtol=0, atol=1e-6)
    np.testing.assert_allclose(_crop(got1), _crop(ref1), rtol=0, atol=1e-6)


def test_amaze_mega_kernel_matches_xla(rng):
    """The tile-resident mega-kernel (amaze_pallas) must match the XLA
    amaze_demosaic to float32-ULP level in interpreter mode (same math,
    same order; tile-internal vertical wraps only ever touch rows whose
    influence dies inside the 16-row aprons). Exact bit-equality holds on
    TPU but not across CPU compilations: XLA:CPU contracts a*b+c into FMAs
    differently for the two programs (measured max rel delta ~5e-7)."""
    import os

    import jax
    import numpy as np

    from mlvfs_tpu.ops.amaze_pallas import amaze_demosaic_pallas

    h, w = 160, 224  # two row tiles at the padded size
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 8000 + 6000 * np.sin(x / 9.0) * np.cos(y / 11.0) + 3000 * (x / w)
    gains = np.array([[0.8, 1.0], [1.0, 0.6]])
    img = np.clip(
        base * gains[y.astype(int) % 2, x.astype(int) % 2] + rng.normal(0, 30, (h, w)),
        0, 65535,
    ).astype(np.float32)

    os.environ["MLVFS_AMAZE_PALLAS"] = "0"
    try:
        r1, g1, b1 = jax.jit(core.amaze_demosaic)(jnp.asarray(img))
    finally:
        del os.environ["MLVFS_AMAZE_PALLAS"]
    r2, g2, b2 = amaze_demosaic_pallas(jnp.asarray(img), interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5, atol=0.01)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=0.01)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-5, atol=0.01)


def test_amaze_split_matches_mega(rng):
    """The split pipeline (per-stage kernels + sublane-stacked scan kernels)
    must match the mega kernel to float32-ULP level."""
    import numpy as np

    from mlvfs_tpu.ops.amaze_pallas import amaze_demosaic_pallas

    h, w = 160, 224
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 9000 + 5000 * np.sin(x / 7.0) * np.cos(y / 13.0)
    gains = np.array([[0.8, 1.0], [1.0, 0.6]])
    img = np.clip(
        base * gains[y.astype(int) % 2, x.astype(int) % 2] + rng.normal(0, 40, (h, w)),
        0, 65535,
    ).astype(np.float32)
    mega = amaze_demosaic_pallas(jnp.asarray(img), interpret=True, mode="mega")
    split = amaze_demosaic_pallas(jnp.asarray(img), interpret=True, mode="split")
    for a, b in zip(mega, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=0.01)


def test_fullframe_scans_wide_blocks(rng):
    """The full-array scan entry points (refine/dilate/chroma_pallas — the
    ones amaze_core's _use_pallas_scans path calls) must also compile at
    1920-wide block sizes: they each need the raised scoped-vmem limit, not
    just the split-pipeline _run_pass (r3 regression: only _run_pass had
    it, so 1080p reconstruct worked through the split pipeline but the
    stage-level Pallas swaps OOMed VMEM at compile time on v5e)."""
    import jax
    import os

    interpret = jax.default_backend() != "tpu"
    hp, wp = 2 * sp.SCAN_TILE, 1920
    wt = jnp.asarray(rng.random((hp, wp), np.float32))
    os.environ["MLVFS_AMAZE_PALLAS"] = "0"
    try:
        ref = core._neighbor_refine_scan(wt, hp, wp)
    finally:
        del os.environ["MLVFS_AMAZE_PALLAS"]
    got = sp.refine_pallas(wt, hp, wp, interpret=interpret)
    np.testing.assert_allclose(
        np.asarray(got)[: hp - 16], np.asarray(ref)[: hp - 16], rtol=0, atol=1e-6
    )
    # dilate + chroma: compile/run coverage at the wide block size
    nyq = jnp.asarray((rng.random((hp, wp)) > 0.6).astype(np.int32))
    assert sp.dilate_pallas(nyq, hp, wp, interpret=interpret).shape == (hp, wp)
    D = jnp.asarray(rng.normal(0, 0.1, (hp, wp)).astype(np.float32))
    out0, out1 = sp.chroma_pallas(D, D, hp, wp, interpret=interpret)
    assert out0.shape == (hp, wp) and out1.shape == (hp, wp)


def test_refine_wide_frame_blocks(rng):
    """1920-wide frames produce wpp=2048 scan blocks, which exceed the
    default 16 MB scoped-vmem limit — regression for the 1080p dual-ISO
    compile failure on v5e. Interpret mode checks the math everywhere; the
    on-TPU suite run compiles the real (large-block) kernel."""
    import jax

    interpret = jax.default_backend() != "tpu"
    wpp = 2048
    wt = jnp.asarray(rng.random((2, sp.SCAN_TILE, wpp), dtype=np.float32))
    from mlvfs_tpu.ops import amaze_core as core

    want = core.scan_refine_tiles(wt, wpp) if hasattr(core, "scan_refine_tiles") else None
    got = np.asarray(sp.refine_tiles(wt, wpp, interpret=interpret))
    assert got.shape == wt.shape
    if want is not None:
        np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=2e-6)
