"""End-to-end conversion engine tests (config 1 of BASELINE: plain MLV→DNG)."""

import os

import numpy as np
import pytest

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.pipeline.config import ProcessingConfig
from mlvfs_tpu.pipeline.convert import convert_clip
from mlvfs_tpu.emit.dng import HEADER_SIZE

from . import oracle


def _read_dng(path):
    with open(path, "rb") as f:
        raw = f.read()
    return raw[:HEADER_SIZE], np.frombuffer(raw, "<u2", offset=HEADER_SIZE)


def test_convert_plain(tmp_path):
    src = str(tmp_path / "CLIP.MLV")
    spec = synth.write_mlv(src, width=320, height=96, frames=5)
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig(batch_size=2))
    assert len(paths) == 5
    assert [os.path.basename(p) for p in paths] == [f"CLIP_{i:06d}.dng" for i in range(5)]

    expected = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    for i, p in enumerate(paths):
        header, img = _read_dng(p)
        assert len(header) == HEADER_SIZE
        assert header[:4] == b"II\x2a\x00"
        assert img.size == spec.width * spec.height
    # frame 0 content must round-trip exactly through pack → device unpack
    _, img0 = _read_dng(paths[0])
    np.testing.assert_array_equal(img0.reshape(spec.height, spec.width), expected)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_convert_matches_oracle_bytes(tmp_path):
    """The full written DNG (header + payload) matches reference output."""
    src = str(tmp_path / "GOLD.MLV")
    spec = synth.write_mlv(src, width=256, height=64, frames=2)
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig())

    clip = MLVClip(src)
    from mlvfs_tpu.ops.unpack import bytes_to_words_np

    for i, p in enumerate(paths):
        fh = clip.frame_headers(i)
        header, img = _read_dng(p)
        ref_header = oracle.dng_header(fh, 0.0, "GOLD")
        assert header == ref_header
        words = bytes_to_words_np(np.asarray(clip.frame_payload(i)))
        ref_img = oracle.unpack(fh, words, spec.width * spec.height)
        np.testing.assert_array_equal(img, ref_img)


def test_convert_lzma(tmp_path):
    src = str(tmp_path / "LZCLIP.MLV")
    spec = synth.write_mlv(src, width=128, height=32, frames=2, compression="lzma")
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig())
    expected = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    _, img0 = _read_dng(paths[0])
    np.testing.assert_array_equal(img0.reshape(spec.height, spec.width), expected)


def test_convert_deflicker(tmp_path):
    src = str(tmp_path / "DF.MLV")
    spec = synth.write_mlv(src, width=320, height=96, frames=2)
    outdir = str(tmp_path / "out")
    paths = convert_clip(src, outdir, ProcessingConfig(deflicker=3000))
    header, _ = _read_dng(paths[0])
    if oracle.available():
        clip = MLVClip(src)
        fh = clip.frame_headers(0)
        from mlvfs_tpu.ops.unpack import bytes_to_words_np

        words = bytes_to_words_np(np.asarray(clip.frame_payload(0)))
        img = oracle.unpack(fh, words, spec.width * spec.height).reshape(spec.height, spec.width)
        num, den = oracle.deflicker(fh, 3000, img)
        fh.rawi["raw_info"]["exposure_bias"] = (num, den)
        from mlvfs_tpu.emit.dng import build_dng_header

        assert header == build_dng_header(fh, 0.0, "DF")


def test_cli_convert_and_info(tmp_path, capsys):
    from mlvfs_tpu.cli import main

    src = str(tmp_path / "CLI.MLV")
    synth.write_mlv(src, width=128, height=32, frames=3, audio=True)
    out = str(tmp_path / "out")
    assert main(["convert", src, "-o", out]) == 0
    assert len(os.listdir(out)) == 3
    assert main(["info", src]) == 0
    text = capsys.readouterr().out
    assert "128x32" in text and "3 video" in text


def test_cli_wav_gif_log(tmp_path):
    from mlvfs_tpu.cli import main
    from mlvfs_tpu.emit.gif import gif_size

    src = str(tmp_path / "AV.MLV")
    synth.write_mlv(src, width=128, height=32, frames=3, audio=True, debug_log="dbg\n")
    wav_out = str(tmp_path / "a.wav")
    gif_out = str(tmp_path / "a.gif")
    assert main(["wav", src, "-o", wav_out]) == 0
    assert main(["gif", src, "-o", gif_out]) == 0
    assert os.path.getsize(gif_out) == gif_size(128, 32)
    with open(wav_out, "rb") as f:
        hdr = f.read(16)
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
