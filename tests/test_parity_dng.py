"""Bit-exact parity vs the compiled reference: DNG headers, unpack, deflicker."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.format.bits import pack_bits_np
from mlvfs_tpu.ops.unpack import unpack_words, bytes_to_words_np
from mlvfs_tpu.ops.histogram import deflicker_median
from mlvfs_tpu.emit.dng import build_dng_header

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")


def _clip(tmp_path, **kw):
    path = str(tmp_path / "PARITY.MLV")
    spec = synth.write_mlv(path, **kw)
    return MLVClip(path), spec


@pytest.mark.parametrize(
    "kw",
    [
        dict(width=256, height=64),
        dict(width=1920, height=1080, frames=1),
        dict(width=256, height=64, camera_name="Canon EOS 7D", wb_mode=6),
        dict(width=256, height=64, kelvin=3200),
        dict(width=2240, height=718, frames=1),  # squeeze heuristic path (AR>2, h<=720)
        dict(width=1808, height=726, frames=1, active_area=(10, 60, 726, 1808)),
        # AsShotNeutral ulp cases (found by tools/fuzz_oracle.py): the C
        # computes `1 / pre_mul[c]` in float32 and stores rgb_cam as float
        # (dng.c:357,414); full-double math lands one past the x1e6
        # truncation boundary at these kelvin/matrix combinations
        dict(width=256, height=64, camera_name="Canon EOS 7D", wb_mode=4),
        dict(width=256, height=64, camera_name="Canon EOS 7D", wb_mode=3),
        dict(width=256, height=64, camera_name="Canon EOS 700D", kelvin=4196),
        dict(width=256, height=64, camera_name="Canon EOS Unknown", kelvin=9092),
    ],
)
def test_dng_header_byte_exact(tmp_path, kw):
    clip, spec = _clip(tmp_path, **kw)
    fh = clip.frame_headers(0)
    ref = oracle.dng_header(fh, 0.0, "PARITY")
    ours = build_dng_header(fh, 0.0, "PARITY")
    assert len(ref) == len(ours) == 65536
    if ref != ours:
        diff = [i for i in range(65536) if ref[i] != ours[i]]
        raise AssertionError(f"header differs at {len(diff)} bytes, first at {diff[:16]}")


def test_dng_header_fps_override(tmp_path):
    clip, spec = _clip(tmp_path, width=256, height=64)
    fh = clip.frame_headers(0)
    assert oracle.dng_header(fh, 23.976, "X") == build_dng_header(fh, 23.976, "X")


def test_dng_header_later_frame_timecode(tmp_path):
    clip, spec = _clip(tmp_path, width=256, height=64, frames=4)
    fh = clip.frame_headers(3)
    assert oracle.dng_header(fh, 0.0, "X") == build_dng_header(fh, 0.0, "X")


@pytest.mark.parametrize("bpp", [10, 12, 14])
def test_unpack_parity(tmp_path, bpp, rng):
    clip, spec = _clip(tmp_path, width=320, height=32, bpp=bpp)
    fh = clip.frame_headers(0)
    n = spec.width * spec.height
    payload = np.asarray(clip.frame_payload(0))
    words = bytes_to_words_np(payload)
    ref = oracle.unpack(fh, words, n)
    ours = np.asarray(jax.jit(unpack_words, static_argnums=(1, 2))(jnp.asarray(words), bpp, n))
    np.testing.assert_array_equal(ref, ours)


def test_deflicker_parity(tmp_path):
    clip, spec = _clip(tmp_path, width=320, height=96)
    fh = clip.frame_headers(0)
    payload = np.asarray(clip.frame_payload(0))
    words = bytes_to_words_np(payload)
    img = oracle.unpack(fh, words, spec.width * spec.height).reshape(spec.height, spec.width)

    target = 3000
    ref_num, ref_den = oracle.deflicker(fh, target, img)
    white = (1 << spec.bpp) + 1
    med = int(jax.jit(deflicker_median, static_argnums=(1,))(jnp.asarray(img), white))
    corr = np.log2((target - spec.black) / float(med - spec.black))
    assert (int(corr * 10000), 10000) == (ref_num, ref_den)


def test_header_template_matches_full_build(tmp_path):
    """DNGHeaderTemplate.render must be byte-identical to build_dng_header
    for every frame, including per-frame deflicker bias, dual-ISO level
    scaling, and lj92 strip byte counts."""
    from mlvfs_tpu.emit.dng import DNGHeaderTemplate

    src = str(tmp_path / "TPL.MLV")
    synth.write_mlv(src, width=256, height=64, frames=5)
    with MLVClip(src) as clip:
        fh0 = clip.frame_headers(0)
        tpl = DNGHeaderTemplate(fh0, 0.0, "TPL")
        for i in range(clip.frame_count):
            fh = clip.frame_headers(i)
            # vary the per-frame fields like deflicker/dual-ISO would
            bias = (-(i + 1) * 100, 1000)
            black, white = 2048 * 4, 15000 * 4
            ri = fh.rawi["raw_info"]
            ri["exposure_bias"] = bias
            ri["black_level"], ri["white_level"] = black, white
            want = build_dng_header(fh, 0.0, "TPL")
            got = tpl.render(fh, black_level=black, white_level=white,
                             exposure_bias=bias)
            assert got == want
        # lj92 mode: StripByteCounts + Compression tag
        tpl_c = DNGHeaderTemplate(fh0, 0.0, "TPL", compression="lj92",
                                  strip_byte_count=0)
        fh = clip.frame_headers(2)
        want = build_dng_header(fh, 0.0, "TPL", compression="lj92",
                                strip_byte_count=12345)
        got = tpl_c.render(fh, strip_byte_count=12345)
        assert got == want
        # fps override changes the timecode path
        tpl_f = DNGHeaderTemplate(fh0, 24.0, "TPL")
        for i in (0, 3):
            fh = clip.frame_headers(i)
            assert tpl_f.render(fh) == build_dng_header(fh, 24.0, "TPL")
