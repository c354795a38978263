"""MLV container layer: block dtypes, synth, indexing, reader."""

import os

import numpy as np
import pytest

from mlvfs_tpu.format import mlv, synth
from mlvfs_tpu.format.bits import pack_bits_np, unpack_bits_np
from mlvfs_tpu.format.index import build_xref, load_idx, idx_path
from mlvfs_tpu.format.reader import MLVClip, discover_chunks


def test_struct_sizes():
    # sizes must match the C packed structs exactly (mlv.h / raw.h)
    assert mlv.MLVI.itemsize == 52
    assert mlv.VIDF.itemsize == 32
    assert mlv.AUDF.itemsize == 24
    assert mlv.RAWI.itemsize == 180
    assert mlv.RAW_INFO.itemsize == 160
    assert mlv.WAVI.itemsize == 32
    assert mlv.EXPO.itemsize == 40
    assert mlv.LENS.itemsize == 96
    assert mlv.RTCI.itemsize == 44
    assert mlv.IDNT.itemsize == 84
    assert mlv.XREF.itemsize == 24
    assert mlv.XREF_ENTRY.itemsize == 12
    assert mlv.WBAL.itemsize == 44


@pytest.mark.parametrize("bpp", [8, 10, 12, 14, 16])
def test_pack_unpack_roundtrip(bpp, rng):
    n = 1000
    vals = rng.integers(0, 1 << bpp, n).astype(np.uint16)
    words = pack_bits_np(vals, bpp)
    back = unpack_bits_np(words, bpp, n)
    np.testing.assert_array_equal(vals, back)


def test_synth_and_read(tmp_clip):
    path, spec = tmp_clip
    clip = MLVClip(path)
    assert clip.frame_count == spec.frames
    fh = clip.frame_headers(0)
    assert fh.xres == spec.width and fh.yres == spec.height
    assert fh.raw_info.bits_per_pixel == 14
    assert fh.raw_info.black_level == spec.black
    assert not clip.has_audio
    assert bytes(fh.idnt["cameraName"]).rstrip(b"\0").decode() == spec.camera_name


def test_frame_payload_unpacks(tmp_clip, rng):
    path, spec = tmp_clip
    clip = MLVClip(path)
    data = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    payload = np.asarray(clip.frame_payload(0))
    words = payload.view("<u2") if len(payload) % 2 == 0 else None
    assert words is not None
    pixels = unpack_bits_np(words, 14, spec.width * spec.height)
    np.testing.assert_array_equal(pixels.reshape(spec.height, spec.width), data)


def test_idx_sidecar_roundtrip(tmp_clip):
    path, _ = tmp_clip
    clip = MLVClip(path)  # builds + saves .IDX
    table = load_idx(path)
    assert table is not None
    clip2 = MLVClip(path)  # loads from sidecar
    np.testing.assert_array_equal(np.asarray(clip.xref), np.asarray(clip2.xref))
    # timestamps sorted
    assert (table["frameType"] == mlv.FRAME_VIDF).sum() == clip.frame_count


def test_out_of_order_blocks(tmp_path):
    path = str(tmp_path / "OOO.MLV")
    spec = synth.write_mlv(path, frames=6, out_of_order=True)
    clip = MLVClip(path)
    assert clip.frame_count == 6
    # frames must come back in temporal order regardless of file order
    for i in range(6):
        fh = clip.frame_headers(i)
        assert int(fh.vidf["frameNumber"]) == i


def test_multi_chunk(tmp_path):
    path = str(tmp_path / "CHUNKS.MLV")
    synth.write_mlv(path, frames=9, chunks=3)
    assert len(discover_chunks(path)) == 3
    clip = MLVClip(path)
    assert clip.frame_count == 9
    for i in range(9):
        assert int(clip.frame_headers(i).vidf["frameNumber"]) == i


def test_debug_log(tmp_path):
    path = str(tmp_path / "LOG.MLV")
    synth.write_mlv(path, frames=2, debug_log="hello camera debug log\n")
    clip = MLVClip(path)
    assert clip.debug_log() == "hello camera debug log\n"


def test_audio_clip(tmp_path):
    path = str(tmp_path / "AUD.MLV")
    synth.write_mlv(path, frames=4, audio=True)
    clip = MLVClip(path)
    assert clip.has_audio
    assert clip.audio_frame_count == 4
    total = sum(len(p) for p in clip.audio_payloads())
    assert total > 0


def test_lzma_clip(tmp_path):
    path = str(tmp_path / "LZ.MLV")
    spec = synth.write_mlv(path, frames=2, compression="lzma")
    clip = MLVClip(path)
    fh = clip.frame_headers(0)
    assert fh.compression == "lzma"
    assert clip.frame_count == 2


def test_extra_metadata_blocks(tmp_path):
    """INFO/MARK/STYL/ELVL blocks (mlv.h:175-215) index cleanly and do not
    disturb frame extraction or conversion."""
    import numpy as np
    from mlvfs_tpu.pipeline.config import ProcessingConfig
    from mlvfs_tpu.pipeline.convert import convert_clip
    from mlvfs_tpu.emit.dng import HEADER_SIZE

    src = str(tmp_path / "X.MLV")
    spec = synth.write_mlv(
        src, width=320, height=96, frames=3, extra_blocks=True, out_of_order=True
    )
    with MLVClip(src) as clip:
        assert clip.frame_count == 3
        fh = clip.frame_headers(0)
        assert fh.xres == 320
    paths = convert_clip(src, str(tmp_path / "out"), ProcessingConfig(batch_size=2))
    assert len(paths) == 3
    expected = synth.make_frame_data(spec, np.random.default_rng(spec.seed))
    img = np.fromfile(paths[0], "<u2", offset=HEADER_SIZE).reshape(96, 320)
    np.testing.assert_array_equal(img, expected)


def test_truncated_clip_recovers_leading_frames(tmp_path):
    """Scanning stops at a truncated block; earlier frames stay readable
    (index.c:248-252 block-size sanity / short-read stop)."""
    src = str(tmp_path / "T.MLV")
    synth.write_mlv(src, width=320, height=96, frames=4)
    with MLVClip(src, use_sidecar=False) as clip:
        offs = [
            int(e["frameOffset"])
            for e in clip.xref
            if int(e["frameType"]) == mlv.FRAME_VIDF
        ]
    # cut the file inside the last VIDF's block header
    with open(src, "r+b") as f:
        f.truncate(offs[3] + 10)
    with MLVClip(src, use_sidecar=False) as clip:
        assert clip.frame_count == 3
        clip.frame_payload(2)


def test_corrupt_block_size_stops_scan(tmp_path):
    """A garbage blockSize mid-stream ends the scan without raising."""
    import numpy as np

    src = str(tmp_path / "C.MLV")
    synth.write_mlv(src, width=320, height=96, frames=4)
    with MLVClip(src, use_sidecar=False) as clip:
        # find the 3rd VIDF's header offset via the index
        offs = [
            int(e["frameOffset"])
            for e in clip.xref
            if int(e["frameType"]) == mlv.FRAME_VIDF
        ]
    with open(src, "r+b") as f:
        f.seek(offs[2] + 4)  # blockSize field of the 3rd VIDF
        f.write(np.uint32(0xFFFFFFFF).tobytes())
    with MLVClip(src, use_sidecar=False) as clip:
        assert clip.frame_count == 2
        clip.frame_payload(1)


def test_chunk_guid_mismatch_excluded(tmp_path):
    """A spill chunk whose MLVI GUID differs is not indexed
    (index.c:277-282)."""
    src = str(tmp_path / "G.MLV")
    synth.write_mlv(src, width=320, height=96, frames=6, chunks=2)
    chunk = src[:-2] + "00"
    with MLVClip(src, use_sidecar=False) as clip:
        assert clip.frame_count == 6
    # corrupt the chunk's GUID
    import numpy as np

    with open(chunk, "r+b") as f:
        hdr = np.fromfile(chunk, mlv.MLVI, 1)[0].copy()
        hdr["fileGuid"] = 0x1111111111111111
        f.seek(0)
        f.write(hdr.tobytes())
    with MLVClip(src, use_sidecar=False) as clip:
        assert clip.frame_count == 3


def test_stale_idx_rebuild(tmp_path):
    """A sidecar with no VIDF entries forces a rebuild
    (mlv_get_frame_count fallback, index.c:506-522)."""
    src = str(tmp_path / "S.MLV")
    synth.write_mlv(src, width=320, height=96, frames=0)
    with MLVClip(src) as clip:  # writes an .IDX with zero VIDFs
        assert clip.frame_count == 0
    assert os.path.isfile(idx_path(src))
    stale = open(idx_path(src), "rb").read()
    synth.write_mlv(src, width=320, height=96, frames=4)
    with open(idx_path(src), "wb") as f:
        f.write(stale)  # restore the stale sidecar
    with MLVClip(src) as clip:
        assert clip.frame_count == 4  # rebuilt, not trusted


def test_garbage_file_no_crash(tmp_path):
    """Random bytes behind a valid magic (or none) must not crash the
    reader — worst case is an empty index."""
    rng = np.random.default_rng(42)
    for i, prefix in enumerate([b"", b"MLVI", b"MLVI" + bytes(48)]):
        src = str(tmp_path / f"G{i}.MLV")
        with open(src, "wb") as f:
            f.write(prefix + rng.bytes(4096))
        try:
            with MLVClip(src, use_sidecar=False) as clip:
                assert clip.frame_count >= 0
        except (ValueError, KeyError) as e:
            pass  # a clean parse error is acceptable; a crash is not
