"""Measure single-core wall-clock of the COMPILED REFERENCE C per op.

Times the oracle (tests/oracle — the reference's own .c files compiled -O2
out of /root/reference) on synthetic 1080p frames, producing the
C-ms/frame anchors that BASELINE.md's per-config "Nx reference" claims
cite. Single-threaded by construction: the oracle calls run on one core,
exactly like the reference's per-FUSE-thread processing.

Usage: python tools/bench_reference.py [--json out.json]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.bits import pack_bits_np
from mlvfs_tpu.format.reader import MLVClip
from tests import oracle


def timeit(fn, min_time=1.0, min_iters=3):
    fn()  # warm (touch tables, page in)
    t0 = time.perf_counter()
    iters = 0
    while True:
        fn()
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= min_time and iters >= min_iters:
            return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--quick", action="store_true", help="fewer iterations")
    args = ap.parse_args()
    min_time = 0.2 if args.quick else 1.0

    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="benchref")
    results = {}

    def rec(name, ms):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:9.2f} ms/frame", flush=True)

    # ---- 1080p plain clip -------------------------------------------------
    H, W = 1080, 1920
    path = os.path.join(tmp, "P.MLV")
    spec = synth.write_mlv(path, width=W, height=H, frames=1, seed=7)
    clip = MLVClip(path)
    fh = clip.frame_headers(0)
    rng = np.random.default_rng(spec.seed)
    img = synth.make_frame_data(spec, rng)

    packed = pack_bits_np(img.reshape(-1), 14).view("<u2")
    rec("unpack 14-bit 1080p", 1e3 * timeit(lambda: oracle.unpack(fh, packed, H * W), min_time))
    rec("dng header build", 1e3 * timeit(lambda: oracle.dng_header(fh, 23.976, "P"), min_time))
    for m in (2, 3, 5):
        rec(f"chroma smooth {m}x{m}", 1e3 * timeit(lambda m=m: oracle.chroma_smooth(fh, img, m), min_time))
    rec("bad pixel fix (detect+apply)", 1e3 * timeit(lambda: oracle.fix_bad_pixels(fh, img, 0, 0), min_time))
    t_comp = timeit(lambda: oracle.stripes(fh, img, False), min_time)
    t_both = timeit(lambda: oracle.stripes(fh, img, True), min_time)
    rec("stripes compute (per clip)", 1e3 * t_comp)
    rec("stripes apply (per frame)", 1e3 * max(t_both - t_comp, 0.0))
    pn_img = (img.astype(np.int32) - 0).astype(np.int16)
    rec("pattern noise", 1e3 * timeit(lambda: oracle.fix_pattern_noise(pn_img, spec.white), min_time))
    rec("deflicker", 1e3 * timeit(lambda: oracle.deflicker(fh, 3072, img), min_time))

    # focus pixels need a camera with shipped .fpm maps (EOS M / 100D etc.)
    fpath = os.path.join(tmp, "F.MLV")
    fspec = synth.write_mlv(
        fpath, width=1808, height=727, frames=1, seed=7, camera_model=0x80000331
    )
    fclip = MLVClip(fpath)
    ffh = fclip.frame_headers(0)
    fimg = synth.make_frame_data(fspec, np.random.default_rng(fspec.seed))
    import mlvfs_tpu

    data_dir = os.path.join(os.path.dirname(mlvfs_tpu.__file__), "data")
    with oracle.capture_c_stdout():
        t_fpm = timeit(lambda: oracle.fix_focus_pixels(ffh, fimg, 0, cwd=data_dir), min_time)
    rec("focus pixel fix (1808x727)", 1e3 * t_fpm)

    # ---- dual-ISO clips ---------------------------------------------------
    dpath = os.path.join(tmp, "D.MLV")
    dspec = synth.write_mlv(dpath, width=W, height=H, frames=1, seed=11, dual_iso=2)
    dclip = MLVClip(dpath)
    dfh = dclip.frame_headers(0)
    dimg = synth.make_frame_data(dspec, np.random.default_rng(dspec.seed))
    rec("dual-ISO preview 1080p", 1e3 * timeit(lambda: oracle.hdr_preview(dfh, dimg), min_time))
    with oracle.capture_c_stdout():
        t_mean23 = timeit(lambda: oracle.cr2hdr20(dfh, dimg, interp=1), min_time, min_iters=2)
        t_amaze = timeit(lambda: oracle.cr2hdr20(dfh, dimg, interp=0), min_time, min_iters=2)
        t_amaze_cs = timeit(lambda: oracle.cr2hdr20(dfh, dimg, interp=0, cs_method=3), min_time, min_iters=2)
    rec("cr2hdr20 mean23 1080p", 1e3 * t_mean23)
    rec("cr2hdr20 amaze-edge 1080p", 1e3 * t_amaze)
    rec("cr2hdr20 amaze-edge+cs3x3 1080p", 1e3 * t_amaze_cs)

    d2path = os.path.join(tmp, "D2.MLV")
    d2spec = synth.write_mlv(d2path, width=1280, height=960, frames=1, seed=11, dual_iso=2)
    d2clip = MLVClip(d2path)
    d2fh = d2clip.frame_headers(0)
    d2img = synth.make_frame_data(d2spec, np.random.default_rng(d2spec.seed))
    with oracle.capture_c_stdout():
        t_amaze2 = timeit(lambda: oracle.cr2hdr20(d2fh, d2img, interp=0), min_time, min_iters=2)
        t_mean232 = timeit(lambda: oracle.cr2hdr20(d2fh, d2img, interp=1), min_time, min_iters=2)
    rec("cr2hdr20 amaze-edge 1280x960", 1e3 * t_amaze2)
    rec("cr2hdr20 mean23 1280x960", 1e3 * t_mean232)

    # AMaZE demosaic alone (1280x960 squeezed half-height frame like hdr.c)
    sq = (d2img.astype(np.float32))[: 960 // 2]
    with oracle.capture_c_stdout():
        t_am = timeit(lambda: oracle.amaze(sq), min_time, 2)
    rec("amaze demosaic alone 1280x480", 1e3 * t_am)

    # ---- codecs -----------------------------------------------------------
    enc = oracle.lj92_encode(img, 16)
    rec("lj92 encode 1080p", 1e3 * timeit(lambda: oracle.lj92_encode(img, 16), min_time))
    rec("lj92 decode 1080p", 1e3 * timeit(lambda: oracle.lj92_decode(enc), min_time))
    import lzma as _lzma

    filt = [{"id": _lzma.FILTER_LZMA1, "preset": 1}]
    comp = _lzma.compress(img.tobytes(), format=_lzma.FORMAT_ALONE, filters=filt)
    rec("lzma decode 1080p (liblzma)", 1e3 * timeit(
        lambda: _lzma.decompress(comp, format=_lzma.FORMAT_ALONE), min_time))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
