"""LJ92 codec: roundtrips, reference interop, MLV decode, compressed DNG."""

import os
import struct

import numpy as np
import pytest

from mlvfs_tpu.codecs import lj92
from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.pipeline.config import ProcessingConfig
from mlvfs_tpu.pipeline.convert import convert_clip
from mlvfs_tpu.emit.dng import HEADER_SIZE

from . import oracle

pytestmark = pytest.mark.skipif(not lj92.available(), reason="native codec unavailable")


def _image(rng, h=240, w=320, peak=16383):
    base = peak * 0.3 + peak * 0.2 * np.sin(np.arange(w) / 23.0)[None, :]
    return np.clip(base + rng.normal(0, 30, (h, w)), 0, peak).astype(np.uint16)


@pytest.mark.parametrize("ncomp,bits", [(1, 14), (1, 16), (2, 16), (2, 14)])
def test_roundtrip(rng, ncomp, bits):
    img = _image(rng, peak=(1 << bits) - 1)
    enc = lj92.encode(img, ncomp=ncomp, bits=bits)
    dec, w, h, b, nc = lj92.decode(enc)
    assert (w * nc, h, b, nc) == (img.shape[1], img.shape[0], bits, ncomp)
    np.testing.assert_array_equal(dec, img)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_interop_with_reference(rng):
    img = _image(rng)
    # our encoder → reference decoder
    dec, w, h, bits = oracle.lj92_decode(lj92.encode(img, ncomp=1, bits=14))
    np.testing.assert_array_equal(dec, img)
    # reference encoder → our decoder
    dec2, *_ = lj92.decode(oracle.lj92_encode(img, bitdepth=14))
    np.testing.assert_array_equal(dec2, img)


def test_lj92_mlv_clip_converts(tmp_path):
    src = str(tmp_path / "LJ.MLV")
    spec = synth.write_mlv(src, width=256, height=64, frames=2, compression="lj92")
    clip = MLVClip(src)
    assert clip.frame_headers(0).compression == "lj92"
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig())
    expected = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    img = np.fromfile(paths[0], "<u2", offset=HEADER_SIZE).reshape(64, 256)
    np.testing.assert_array_equal(img, expected)


def test_compressed_dng_output(tmp_path):
    src = str(tmp_path / "C.MLV")
    spec = synth.write_mlv(src, width=256, height=64, frames=2)
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig(compress="lj92"))
    expected = synth.make_frame_data(spec, np.random.default_rng(spec.seed))

    raw = open(paths[0], "rb").read()
    # parse the TIFF: Compression must be 7, strip decodes losslessly
    (n,) = struct.unpack_from("<H", raw, 8)
    tags = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from("<HHII", raw, 10 + 12 * i)
        tags[tag] = val
    assert tags[259] == 7  # ccJPEG
    strip_size = tags[279]
    assert HEADER_SIZE + strip_size == len(raw)
    assert strip_size < expected.nbytes  # actually compressed
    dec, w, h, bits, nc = lj92.decode(raw[HEADER_SIZE:])
    assert nc == 2 and w * nc == 256 and h == 64
    np.testing.assert_array_equal(dec, expected)
