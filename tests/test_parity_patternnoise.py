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
