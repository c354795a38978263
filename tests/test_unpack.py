"""Device-side unpack kernel vs the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlvfs_tpu.format.bits import pack_bits_np, unpack_bits_np
import functools

import jax

from mlvfs_tpu.ops.unpack import (
    unpack_words,
    unpack_batch,
    pack16,
    lj92_detile,
    words_for_pixels,
    bytes_to_words_np,
)

# jit with static bpp/size — the production pipeline always runs these jitted
_unpack = jax.jit(unpack_words, static_argnums=(1, 2))
_unpack_batch = jax.jit(unpack_batch, static_argnums=(1, 2, 3))
_pack16 = jax.jit(pack16, static_argnums=(1,))


@pytest.mark.parametrize("bpp", [8, 10, 12, 14])
def test_unpack_matches_numpy(bpp, rng):
    n = 4096
    vals = rng.integers(0, 1 << bpp, n).astype(np.uint16)
    words = pack_bits_np(vals, bpp)
    dev = np.asarray(_unpack(jnp.asarray(words), bpp, n))
    np.testing.assert_array_equal(dev, vals)


@pytest.mark.parametrize("bpp", [10, 14])
def test_unpack_odd_sizes(bpp, rng):
    # non-multiple-of-block pixel counts exercise padding paths
    for n in [1, 7, 33, 1023]:
        vals = rng.integers(0, 1 << bpp, n).astype(np.uint16)
        words = pack_bits_np(vals, bpp)
        dev = np.asarray(_unpack(jnp.asarray(words), bpp, n))
        np.testing.assert_array_equal(dev, vals)


@pytest.mark.parametrize("bpp", [8, 10, 12, 14])
def test_pack16_roundtrip(bpp, rng):
    n = 512
    vals = rng.integers(0, 1 << bpp, n).astype(np.uint16)
    words = _pack16(jnp.asarray(vals), bpp)
    np.testing.assert_array_equal(
        np.asarray(words)[: words_for_pixels(n, bpp)],
        pack_bits_np(vals, bpp)[: words_for_pixels(n, bpp)],
    )


def test_unpack_batch(rng):
    b, h, w, bpp = 3, 8, 64, 14
    frames = rng.integers(0, 1 << bpp, (b, h, w)).astype(np.uint16)
    words = np.stack([pack_bits_np(f.ravel(), bpp) for f in frames])
    out = np.asarray(_unpack_batch(jnp.asarray(words), bpp, h, w))
    np.testing.assert_array_equal(out, frames)


@pytest.mark.parametrize("h,w", [(8, 16), (6, 10), (10, 6), (4, 128)])
def test_lj92_detile_matches_reference_scatter(h, w, rng):
    src = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    # reference scatter (main.c:652-668)
    expected = np.zeros_like(src)
    for y in range(h):
        dy = (2 * y) % h + (2 * y) // h
        for x in range(w):
            dx = (2 * x) % w + (2 * x) // w
            expected[dy, dx] = src[y, x]
    out = np.asarray(lj92_detile(jnp.asarray(src)))
    np.testing.assert_array_equal(out, expected)


def test_bytes_to_words(rng):
    b = rng.integers(0, 256, 10).astype(np.uint8)
    w = bytes_to_words_np(b)
    assert int(w[0]) == int(b[0]) | (int(b[1]) << 8)
