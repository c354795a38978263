"""Prefetch pipeline + multi-device sharded conversion (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax

from mlvfs_tpu.format import synth
from mlvfs_tpu.pipeline.config import ProcessingConfig
from mlvfs_tpu.pipeline.convert import convert_clip
from mlvfs_tpu.pipeline.stream import BatchPrefetcher
from mlvfs_tpu.emit.dng import HEADER_SIZE


def test_prefetcher_order_and_results():
    fetched = []

    def fetch(idx):
        fetched.append(tuple(idx))
        return sum(idx)

    batches = [[0, 1], [2, 3], [4]]
    out = list(BatchPrefetcher(fetch, batches, depth=2))
    assert [tuple(i) for i, _ in out] == [(0, 1), (2, 3), (4,)]
    assert [v for _, v in out] == [1, 5, 4]
    assert set(fetched) == {(0, 1), (2, 3), (4,)}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_convert_matches_unsharded(tmp_path):
    src = str(tmp_path / "SHARD.MLV")
    spec = synth.write_mlv(src, width=256, height=64, frames=16)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    paths_a = convert_clip(src, out_a, ProcessingConfig(batch_size=8, chroma_smooth=3))
    paths_b = convert_clip(
        src, out_b, ProcessingConfig(batch_size=8, chroma_smooth=3, shard_devices=8)
    )
    for pa, pb in zip(paths_a, paths_b):
        a = np.fromfile(pa, np.uint8)
        b = np.fromfile(pb, np.uint8)
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_dualiso_convert(tmp_path):
    src = str(tmp_path / "DI8.MLV")
    spec = synth.SynthSpec(width=1280, height=960, frames=8, dual_iso=3, seed=3)
    rng = np.random.default_rng(spec.seed)
    frames = np.stack([synth.make_frame_data(spec, rng) for _ in range(8)])
    synth.write_mlv(src, spec, frame_data=frames)
    cfg0 = ProcessingConfig(batch_size=8, dual_iso=2, hdr_interpolation_method=1)
    cfg8 = ProcessingConfig(
        batch_size=8, dual_iso=2, hdr_interpolation_method=1, shard_devices=8
    )
    paths0 = convert_clip(src, str(tmp_path / "out0"), cfg0)
    paths8 = convert_clip(src, str(tmp_path / "out8"), cfg8)
    assert len(paths8) == 8
    img = np.fromfile(paths8[0], "<u2", offset=HEADER_SIZE)
    # dual-ISO reconstruction ran: output is not the 14-bit passthrough
    # (the synthetic scene is dark by design — scene_scale=0.9/2^ev — so the
    # proof is divergence from the source, not a value threshold)
    assert img.size == frames[0].size
    assert not np.array_equal(img.reshape(frames[0].shape), frames[0])
    # and sharding over 8 devices is bit-identical to the single-device path
    for p0, p8 in zip(paths0, paths8):
        np.testing.assert_array_equal(
            np.fromfile(p0, np.uint8), np.fromfile(p8, np.uint8)
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_convert_nondivisible_tail(tmp_path):
    """19 frames / batch 8 → tail of 3: the tail is padded to the mesh
    multiple and runs on the same sharded program (no unsharded fallback),
    and results stay bit-identical to the unsharded path."""
    src = str(tmp_path / "TAIL.MLV")
    synth.write_mlv(src, width=256, height=64, frames=19)
    paths_a = convert_clip(src, str(tmp_path / "a"),
                           ProcessingConfig(batch_size=8, chroma_smooth=3))
    paths_b = convert_clip(
        src, str(tmp_path / "b"),
        ProcessingConfig(batch_size=8, chroma_smooth=3, shard_devices=8),
    )
    assert len(paths_a) == len(paths_b) == 19
    for pa, pb in zip(paths_a, paths_b):
        np.testing.assert_array_equal(np.fromfile(pa, np.uint8),
                                      np.fromfile(pb, np.uint8))


def test_pad_frames_and_batch_target():
    from mlvfs_tpu.parallel.mesh import pad_frames, batch_target, make_mesh

    arr = np.arange(3 * 4).reshape(3, 4).astype(np.uint16)
    padded = pad_frames(arr, 8)
    assert padded.shape == (8, 4)
    np.testing.assert_array_equal(padded[:3], arr)
    for r in range(3, 8):
        np.testing.assert_array_equal(padded[r], arr[2])
    assert pad_frames(arr, 3) is arr
    if len(jax.devices()) >= 8:
        mesh = make_mesh(8)
        assert batch_target(8, mesh) == 8
        assert batch_target(9, mesh) == 16
        assert batch_target(1, mesh) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_dualiso_analysis_matches_unsharded():
    """The device dual-ISO analysis (hdr_check + field/white/exposure order
    statistics + decisions) sharded over an 8-device frame mesh produces the
    same per-frame scalars as the single-device run (VERDICT r3 task 4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mlvfs_tpu.ops import dualiso_full as dif
    from mlvfs_tpu.parallel.mesh import make_mesh, FRAME_AXIS

    b, h, w = 8, 960, 1280
    spec = synth.SynthSpec(width=w, height=h, frames=1, dual_iso=3, seed=11)
    rng = np.random.default_rng(spec.seed)
    imgs = np.stack([synth.make_frame_data(spec, rng) for _ in range(b)])
    black, white = 2048, 15000

    def run(dev_imgs, shard=None):
        kw = {}
        if shard is not None:
            kw = dict(in_shardings=(shard,), out_shardings=shard)
        is_hdr = jax.jit(lambda x: dif.hdr_check_batch(x, black, white), **kw)(dev_imgs)
        if shard is not None:
            kw = dict(in_shardings=(shard, shard), out_shardings=shard)
        ana = jax.jit(lambda x, ih: dif._analyze_batch(x, ih, 0, h, black), **kw)
        return jax.device_get(ana(dev_imgs, is_hdr))

    ref = run(jax.numpy.asarray(imgs))
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P(FRAME_AXIS))
    got = run(jax.device_put(imgs, shard), shard=shard)
    assert np.asarray(ref[0]).any(), "analysis rejected every synthetic dual-ISO frame"
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_amaze_edge_matches_unsharded():
    """The flagship amaze-edge reconstruction (interp_method=0, the XLA
    amaze_core formulation on this backend) sharded over an 8-device frame
    mesh is bit-identical to the single-device run (VERDICT r4 task 4).
    Small geometry keeps the two amaze compiles bounded."""
    import math

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mlvfs_tpu.ops import dualiso_full as dif
    from mlvfs_tpu.ops.luts import EV_RESOLUTION
    from mlvfs_tpu.parallel.mesh import make_mesh, FRAME_AXIS

    b, h, w = 16, 64, 256
    black, white = 2048, 10000
    black20, white20 = black * 64, white * 64
    yy, xx = np.arange(h)[:, None], np.arange(w)[None, :]
    tex = (xx * 37 + yy * 11) % 700
    scene = np.where((yy % 4) < 2, black + tex * 8, black + tex).astype(np.uint16)
    imgs = np.broadcast_to(scene, (b, h, w)).copy()

    white_ev = int(round(math.log2(white - black) * EV_RESOLUTION))
    dummies = (
        jax.numpy.zeros(1, jax.numpy.int32),
        jax.numpy.zeros(10 * 32768 + 1, jax.numpy.int32),
        jax.numpy.zeros(1, jax.numpy.float32),
    )

    def run(dev_imgs, shard=None):
        kw = {}
        if shard is not None:
            kw = dict(in_shardings=(shard,), out_shardings=shard)
        is_hdr = jax.jit(lambda x: dif.hdr_check_batch(x, black, white), **kw)(dev_imgs)
        if shard is not None:
            kw = dict(in_shardings=(shard, shard), out_shardings=shard)
        ana = jax.jit(lambda x, ih: dif._analyze_batch(x, ih, 0, h, black), **kw)
        ok, rb, s_arr, a_arr, b20_arr, wd_arr, ce_arr, ov_arr, _w20 = ana(
            dev_imgs, is_hdr
        )
        assert bool(jax.numpy.any(ok)), "analysis rejected every synthetic frame"
        per_frame = (a_arr, b20_arr, wd_arr, ce_arr, ov_arr)

        def hdr_step(imgs, rb, s_arr, scalars, dummies):
            return dif.reconstruct_batch(
                imgs, rb, s_arr, *scalars, *dummies,
                black20=black20, white20=white20, interp_method=0,
                use_fullres=True, use_alias=True, cs_method=0,
                exact_luts=False, white_ev=white_ev,
            )

        if shard is not None:
            repl = NamedSharding(shard.mesh, P())
            scalar_sh = jax.tree.map(lambda _: shard, per_frame)
            kw = dict(
                in_shardings=(shard, shard, shard, scalar_sh, (repl, repl, repl)),
                out_shardings=shard,
            )
        hdr = jax.jit(hdr_step, **kw)
        return np.asarray(hdr(dev_imgs, rb, s_arr, per_frame, dummies))

    ref = run(jax.numpy.asarray(imgs))
    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P(FRAME_AXIS))
    got = run(jax.device_put(imgs, shard), shard=shard)
    np.testing.assert_array_equal(ref, got)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_zero_copy_fetch_matches_staged(tmp_path):
    """The zero-copy sharded gather (_put_views_sharded, per-device memmap
    view transfers assembled via make_array_from_single_device_arrays) must
    land the same bytes on the same shards as the staged path
    (jax.device_put of one host array under the NamedSharding) it replaced."""
    from mlvfs_tpu.format.reader import MLVClip
    from mlvfs_tpu.pipeline.convert import ClipConverter

    src = str(tmp_path / "ZC.MLV")
    synth.write_mlv(src, width=256, height=64, frames=11)
    eng = ClipConverter(MLVClip(src), ProcessingConfig(batch_size=8, shard_devices=8))
    for indices in ([0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10]):  # full + padded tail
        zc = eng._put_views_sharded(eng._gather_packed_views(indices))
        staged = eng._put(eng._gather_packed_batch(indices))
        assert zc.sharding.is_equivalent_to(staged.sharding, zc.ndim)
        np.testing.assert_array_equal(np.asarray(zc), np.asarray(staged))
        # per-shard placement identical, not just the global view
        for sa, sb in zip(
            sorted(zc.addressable_shards, key=lambda s: s.device.id),
            sorted(staged.addressable_shards, key=lambda s: s.device.id),
        ):
            assert sa.index == sb.index
            np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))
