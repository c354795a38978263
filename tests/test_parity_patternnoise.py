"""Pattern-noise removal parity vs the reference C implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlvfs_tpu.ops.patternnoise import fix_pattern_noise_batch

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")


def _noisy_frame(h, w, seed=0):
    """Flat-ish scene + per-column and per-row FPN + shot noise + an edge."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 4000.0)
    img += rng.normal(0, 15, (h, w))
    col_fpn = rng.normal(0, 6, w // 2)
    row_fpn = rng.normal(0, 5, h // 2)
    img[:, 0::2] += col_fpn[None, : (w + 1) // 2][:, : img[:, 0::2].shape[1]]
    img[0::2, :] += row_fpn[: (h + 1) // 2, None][: img[0::2, :].shape[0]]
    img[:, w // 3 : w // 3 + 4] += 3000  # strong vertical edge → mask path
    img[h // 2 :, :] += 800  # horizontal brightness step
    img[5:9, 5:9] = 15500  # near-white blob → white mask path
    return np.clip(img, 0, 16383).astype(np.uint16)


@pytest.mark.parametrize("size", [(64, 96)])
def test_pattern_noise_parity(size):
    h, w = size
    img = _noisy_frame(h, w)
    ref = oracle.fix_pattern_noise(img.astype(np.int16), white=15000).astype(np.uint16)
    ours = np.asarray(fix_pattern_noise_batch(jnp.asarray(img[None]), 15000))[0]
    np.testing.assert_array_equal(ref, ours)


def test_blur_pallas_matches_xla():
    """The VMEM-resident Pallas blur equals the XLA formulation exactly
    (which is itself bit-exact vs the C — the test above)."""
    from mlvfs_tpu.ops.patternnoise import _edge_aware_blur
    from mlvfs_tpu.ops.patternnoise_pallas import edge_aware_blur_pallas

    rng = np.random.default_rng(3)
    h2, w2 = 37, 96  # odd row count exercises the padding
    chans = [
        jnp.asarray(rng.integers(-2000, 16000, (h2, w2), dtype=np.int32))
        for _ in range(4)
    ]
    # a flat patch makes wide windows; a hard edge breaks them
    chans[1] = chans[1].at[10:20].set(4000)
    want = _edge_aware_blur(*chans)
    got = edge_aware_blur_pallas(*chans, interpret=True)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_blur_pallas_wide_frame():
    """2.5K-width channels (1296 half-res) exercise the block VMEM sizing."""
    from mlvfs_tpu.ops.patternnoise import _edge_aware_blur
    from mlvfs_tpu.ops.patternnoise_pallas import edge_aware_blur_pallas

    rng = np.random.default_rng(5)
    h2, w2 = 16, 1296
    chans = [
        jnp.asarray(rng.integers(0, 16000, (h2, w2), dtype=np.int32))
        for _ in range(4)
    ]
    want = _edge_aware_blur(*chans)
    got = edge_aware_blur_pallas(*chans, interpret=True)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_blur_interleaved_matches_split():
    """The interleaved-grid blur equals deinterleave→blur→reinterleave of
    the split formulation exactly (even dims; PN frames are always even)."""
    import jax.numpy as jnp
    from mlvfs_tpu.ops.patternnoise import _edge_aware_blur
    from mlvfs_tpu.ops.patternnoise_fused import blur_interleaved

    rng = np.random.default_rng(7)
    h, w = 72, 192
    img = jnp.asarray(rng.integers(-2000, 16000, (h, w), dtype=np.int32))
    r, g1, g2, b = img[0::2, 0::2], img[0::2, 1::2], img[1::2, 0::2], img[1::2, 1::2]
    rs, g1s, g2s, bs = _edge_aware_blur(r, g1, g2, b)
    top = jnp.stack([rs, g1s], axis=-1).reshape(h // 2, w)
    bot = jnp.stack([g2s, bs], axis=-1).reshape(h // 2, w)
    want = np.asarray(jnp.stack([top, bot], axis=1).reshape(h, w))
    got = np.asarray(blur_interleaved(img, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_blur_interleaved_multichunk():
    import jax
    import jax.numpy as jnp
    import mlvfs_tpu.ops.patternnoise_fused as pf
    from mlvfs_tpu.ops.patternnoise import _edge_aware_blur

    old = pf.R_SUB
    pf.R_SUB = 16
    jax.clear_caches()
    try:
        rng = np.random.default_rng(8)
        h, w = 90, 192  # not a multiple of the chunk → truncated last chunk
        img = jnp.asarray(rng.integers(-2000, 16000, (h, w), dtype=np.int32))
        r, g1, g2, b = img[0::2, 0::2], img[0::2, 1::2], img[1::2, 0::2], img[1::2, 1::2]
        rs, g1s, g2s, bs = _edge_aware_blur(r, g1, g2, b)
        top = jnp.stack([rs, g1s], axis=-1).reshape(h // 2, w)
        bot = jnp.stack([g2s, bs], axis=-1).reshape(h // 2, w)
        want = np.asarray(jnp.stack([top, bot], axis=1).reshape(h, w))
        got = np.asarray(pf.blur_interleaved(img, interpret=True))
        np.testing.assert_array_equal(got, want)
    finally:
        pf.R_SUB = old
        jax.clear_caches()


def test_direction_interleaved_matches_split():
    """Full single-direction interleaved path (blur + column offsets) equals
    the split formulation bit for bit."""
    import jax.numpy as jnp
    from mlvfs_tpu.ops.patternnoise import _fix_column_noise_rggb
    from mlvfs_tpu.ops.patternnoise_fused import fix_pattern_noise_direction

    rng = np.random.default_rng(9)
    h, w = 72, 192
    img = _noisy_frame(h, w, seed=4).astype(np.int32)
    want = np.asarray(_fix_column_noise_rggb(jnp.asarray(img), 15000))
    got = np.asarray(fix_pattern_noise_direction(jnp.asarray(img), 15000, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pattern_noise_parity_fused_path():
    """End-to-end C parity with the interleaved (Pallas-interpret) path
    forced — the path real TPUs take."""
    import os

    h, w = 64, 96
    img = _noisy_frame(h, w)
    ref = oracle.fix_pattern_noise(img.astype(np.int16), white=15000).astype(np.uint16)
    os.environ["MLVFS_TPU_PN_PALLAS"] = "1"
    os.environ["MLVFS_TPU_PN_INTERPRET"] = "1"
    try:
        ours = np.asarray(fix_pattern_noise_batch(jnp.asarray(img[None]), 15000))[0]
    finally:
        os.environ.pop("MLVFS_TPU_PN_PALLAS", None)
        os.environ.pop("MLVFS_TPU_PN_INTERPRET", None)
    np.testing.assert_array_equal(ref, ours)


def test_pattern_noise_small_dimensions_parity():
    """Frames whose half-res dimension is below the +-25 blur window (e.g.
    40 px tall -> 20 half-res rows for the transposed row pass) must still
    match the reference bit-for-bit — its scan loops clamp at the borders
    (patternnoise.c:123-144) so the window just shrinks. Found by
    tools/fuzz_oracle.py: _shift_cols produced a wrong-width array when the
    shift exceeded the row length, crashing the op at these geometries."""
    rng = np.random.default_rng(3)
    for h, w in ((40, 124), (24, 32), (16, 64)):
        img = rng.integers(0, 15000, (h, w)).astype(np.uint16)
        ref = oracle.fix_pattern_noise(img.astype(np.int16), white=15000).astype(np.uint16)
        ours = np.asarray(fix_pattern_noise_batch(jnp.asarray(img[None]), 15000))[0]
        np.testing.assert_array_equal(ref, ours, err_msg=f"{h}x{w}")


def test_pattern_noise_odd_dimensions():
    """Odd frame sizes (real: EOSM crop 1808x727) process the even-cropped
    region and pass the last row/column through. The reference C has no
    defined semantics here — extract_channel writes ceil(h/2) rows into a
    h/2-row buffer (patternnoise.c:287-296 vs :315-328), a heap overflow —
    so this is a defined-behavior divergence, not an oracle gate."""
    rng = np.random.default_rng(11)
    for h, w in ((97, 160), (96, 161), (97, 161)):
        img = rng.integers(0, 15000, size=(h, w), dtype=np.int64).astype(np.uint16)
        out = np.asarray(fix_pattern_noise_batch(jnp.asarray(img[None]), 15000))[0]
        he, we = h & ~1, w & ~1
        want_core = np.asarray(
            fix_pattern_noise_batch(jnp.asarray(img[None, :he, :we]), 15000)
        )[0]
        np.testing.assert_array_equal(out[:he, :we], want_core)
        np.testing.assert_array_equal(out[he:, :], img[he:, :])
        np.testing.assert_array_equal(out[:, we:], img[:, we:])
