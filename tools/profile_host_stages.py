"""Host-leg stage breakdown at 1080p/14bpp on the current rig.

Measures, per frame, the three host costs that bound BENCH_MODE=host:
  gather  — packed payload -> staged u16 batch (convert._gather_packed_batch)
  write   — 64KiB header + 4.15MB payload writev to tmpfs (convert._write_dng)
  header  — template render
plus raw memcpy/write floors for context. Run with CPU jax:
  env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/profile_host_stages.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlvfs_tpu.format import synth
from mlvfs_tpu.format.reader import MLVClip
from mlvfs_tpu.pipeline.config import ProcessingConfig
from mlvfs_tpu.pipeline.convert import ClipConverter


def rate(fn, n, label, per=1):
    fn()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / (n * per)
        best = min(best, dt)
    print(f"{label:34s} {best*1e3:8.3f} ms/frame   ({1.0/best:8.1f} f/s)")
    return best


def main():
    w, h, bpp = 1920, 1080, 14
    frames, batch = 48, 24
    tmp = tempfile.mkdtemp(prefix="prof_host_", dir="/dev/shm")
    src = os.path.join(tmp, "P.MLV")
    rng = np.random.default_rng(7)
    spec = synth.SynthSpec(width=w, height=h, frames=1, bpp=bpp)
    frame = synth.make_frame_data(spec, rng)
    data = np.ascontiguousarray(np.broadcast_to(frame, (frames, h, w)))
    synth.write_mlv(src, spec, frame_data=data)
    conv = ClipConverter(MLVClip(src, populate=True), ProcessingConfig(batch_size=batch))
    outdir = os.path.join(tmp, "out")
    os.makedirs(outdir, exist_ok=True)
    idx = list(range(batch))

    # stage: gather (zero-copy views — the real uncompressed-path host cost)
    rate(lambda: conv._gather_packed_views(idx), 6, "gather_packed_views (zero-copy)", per=batch)

    # stage: gather (staged copy — still used by the LZMA and sharded paths)
    rate(lambda: conv._gather_packed_batch(idx), 6, "gather_packed_batch (copy)", per=batch)

    # payload memcpy floor (same bytes, plain np copy)
    n_words = conv._gather_packed_batch(idx).shape[1]
    src_words = np.ascontiguousarray(conv._gather_packed_batch(idx))
    dst = np.empty_like(src_words)
    rate(lambda: np.copyto(dst, src_words), 6, "memcpy floor (same bytes)", per=batch)

    # stage: header render
    fh = conv.clip.frame_headers_shared(0)
    tpl = conv._header_template(fh, "P")
    rate(lambda: tpl.render(fh, black_level=2048, white_level=15000, exposure_bias=None),
         200, "header render")

    # stage: single DNG write (writev to tmpfs)
    img = np.zeros((h, w), "<u2")
    header = tpl.render(fh, black_level=2048, white_level=15000, exposure_bias=None)
    path = os.path.join(outdir, "X.dng")
    rate(lambda: conv._write_dng(path, header, img), 24, "write_dng (writev tmpfs)")

    # write floor: plain os.write of same bytes, no tmp+rename
    blob = bytes(header) + img.tobytes()
    def plain_write():
        fd = os.open(path + "2", os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
        os.write(fd, blob)
        os.close(fd)
    rate(plain_write, 24, "plain write floor")

    # full finish_batch (header + writes, includes info plumbing)
    imgs_np = np.zeros((batch, h, w), "<u2")
    info = {"black_level": 2048, "white_level": 15000, "exposure_bias": None}
    rate(lambda: conv._finish_batch(outdir, "P", idx, imgs_np, info), 4,
         "finish_batch total", per=batch)

    conv.close()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
