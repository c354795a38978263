"""Exhaustive 0-1-principle proof of the median-selection networks.

A comparator network selects the m-th order statistic for *every* input
iff it does so for every 0-1 input (Knuth TAOCP vol. 3, 5.3.4: monotone
maps commute with min/max). We evaluate each network on all 2^K binary
inputs bit-parallel (packed uint32 words; min = AND, max = OR per bit
column) — including the same dead-comparator prune the runtime path
uses — and require the output bit to equal [popcount >= K//2 + 1] for
all patterns. This makes `medians.median_planes` *provably*
value-identical to `jnp.sort(stack, axis=0)[K // 2]`, the property the
bit-exact chroma gates rely on (reference `opt_med.h:25-168` provides
the same guarantee via its sorting macros).
"""

import numpy as np
import pytest

from mlvfs_tpu.ops import medians


def _eval_01(pairs, k):
    """Evaluate the pruned network on all 2^k binary inputs, bit-packed.

    Bit p of the 2^k-bit stream is input pattern p; plane e's bit is
    (p >> e) & 1. Packed into uint32 words (bit i of word w = pattern
    w*32 + i, little bit order)."""
    n_bits = 1 << k
    n_words = max(1, n_bits // 32)
    planes = []
    for e in range(k):
        if n_bits < 32:
            const = sum(1 << i for i in range(n_bits) if (i >> e) & 1)
            planes.append(np.full(n_words, const, np.uint32))
        elif e < 5:
            const = sum(1 << i for i in range(32) if (i >> e) & 1)
            planes.append(np.full(n_words, const, np.uint32))
        else:
            w = np.arange(n_words, dtype=np.uint64)
            on = ((w >> (e - 5)) & 1).astype(bool)
            planes.append(np.where(on, np.uint32(0xFFFFFFFF), np.uint32(0)))
    out_index = medians.median_index(k)
    for (a, b) in medians.prune(pairs, out_index):
        lo = planes[a] & planes[b]
        hi = planes[a] | planes[b]
        planes[a], planes[b] = lo, hi
    return planes[out_index]


def _expected_01(k):
    """Packed [popcount(p) > k//2] for all patterns p (median of 0-1
    values with (k+1)//2 ones is 1 exactly when ones >= k//2 + 1)."""
    n_bits = 1 << k
    p = np.arange(n_bits, dtype=np.uint32)
    lut = np.array([bin(i).count("1") for i in range(1 << 13)], np.uint8)
    pop = lut[p & 0x1FFF] + lut[(p >> 13) & 0x1FFF]
    bits = pop >= (k // 2 + 1)
    if n_bits < 32:
        return np.array([sum(1 << i for i in range(n_bits) if bits[i])], np.uint32)
    packed = np.packbits(bits, bitorder="little")
    return packed.view(np.uint32)


@pytest.mark.parametrize("k", sorted(medians.NETWORKS))
def test_network_exhaustive_01(k):
    got = _eval_01(medians.NETWORKS[k], k)
    want = _expected_01(k)
    assert np.array_equal(got, want), f"median network K={k} is NOT a median"


@pytest.mark.parametrize("k", sorted(medians.NETWORKS))
def test_median_planes_matches_sort(k):
    """The jnp runtime path (with pruning) equals jnp.sort[k//2]."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    planes = [
        jnp.asarray(rng.integers(-(2**31), 2**31, size=(7, 33), dtype=np.int64).astype(np.int32))
        for _ in range(k)
    ]
    got = np.asarray(medians.median_planes(planes))
    want = np.asarray(jnp.sort(jnp.stack(planes), axis=0)[k // 2])
    np.testing.assert_array_equal(got, want)


def test_prune_counts():
    """The prune keeps the published network sizes honest: selection nets
    are already minimal-ish, so nothing should be dropped from them."""
    for k, pairs in medians.NETWORKS.items():
        kept = medians.prune(pairs, medians.median_index(k))
        assert len(kept) <= len(pairs)
        # every comparator in a Devillard median network is live
        assert len(kept) == len(pairs), (k, len(kept), len(pairs))
