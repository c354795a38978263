"""Wall-clock mount throughput at a realistic geometry (1080p, batch 16).

VERDICT r3 task 8: the mount row was the only leg in README's table with
dispatch counters but no wall-clock number. This harness mounts a
1920x1080 14bpp synthetic clip through the real kernel FUSE path
(mount daemon on CPU JAX, same scrub recipe as tests/test_mount.py),
reads every DNG sequentially, and prints f/s plus the daemon's
/.mlvfs-stats counters.

Run:  python tools/profile_mount_1080p.py [frames=32] [readahead=16] [cpu|tpu]

The third arg picks the daemon's JAX backend. Default cpu: on this rig
the TPU sits behind a relay tunnel (~35 MB/s), so a TPU-backed mount is
transfer-bound on the ~4.2 MB/frame readback — the r5 measurement is
recorded in README's mount row as the relay-caveat number, not a TPU
ceiling. On a co-located TPU host the same path rides the PCIe DMA the
engine bench measures.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mount_proc(mlv_dir, mnt, readahead, backend="cpu"):
    if backend == "tpu":
        # keep the relay env; PREPEND the repo to PYTHONPATH (the existing
        # entries register the TPU relay's jax plugin — replacing them
        # leaves the daemon's jax with no 'axon' backend)
        env = {k: v for k, v in os.environ.items()
               if k != "MLVFS_TPU_TEST_ON_TPU"}
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["MLVFS_TPU_READAHEAD"] = str(readahead)
        return subprocess.Popen(
            [sys.executable, "-m", "mlvfs_tpu.mount", mnt,
             f"--mlv-dir={mlv_dir}", "--no-gui"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
    else:
        env = {
            k: v for k, v in os.environ.items()
            if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_"))
                    or k in ("PYTHONPATH", "MLVFS_TPU_TEST_ON_TPU"))
        }
        env["JAX_PLATFORMS"] = "cpu"
    env["MLVFS_TPU_READAHEAD"] = str(readahead)
    env["PYTHONPATH"] = REPO
    return subprocess.Popen(
        [sys.executable, "-m", "mlvfs_tpu.mount", mnt, f"--mlv-dir={mlv_dir}",
         "--no-gui"],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _wait_mounted(mnt, proc, timeout=120.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            return False
        try:
            if os.listdir(mnt):
                return True
        except OSError:
            pass
        time.sleep(0.5)
    return False


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    readahead = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    backend = sys.argv[3] if len(sys.argv) > 3 else "cpu"

    from mlvfs_tpu.format import synth
    from mlvfs_tpu.mount import fuse_available

    if not fuse_available():
        print("FUSE unavailable in this sandbox")
        return

    with tempfile.TemporaryDirectory() as tmp:
        clips = os.path.join(tmp, "clips")
        os.mkdir(clips)
        synth.write_mlv(os.path.join(clips, "M08-1080.MLV"),
                        width=1920, height=1080, frames=frames)
        mnt = os.path.join(tmp, "mnt")
        os.mkdir(mnt)
        proc = _mount_proc(clips, mnt, readahead, backend)
        if not _wait_mounted(mnt, proc):
            proc.kill()
            print("mount failed")
            return
        try:
            clip_dir = os.path.join(mnt, "M08-1080.MLV")
            # warm: first read pays jit compile + template build
            with open(os.path.join(clip_dir, "M08-1080_000000.dng"), "rb") as f:
                f.read()
            t0 = time.perf_counter()
            total = 0
            for i in range(frames):
                with open(os.path.join(clip_dir, f"M08-1080_{i:06d}.dng"), "rb") as f:
                    total += len(f.read())
            dt = time.perf_counter() - t0
            with open(os.path.join(mnt, ".mlvfs-stats")) as f:
                stats = json.loads(f.read())
            print(f"geometry 1920x1080 14bpp, {frames} frames, "
                  f"readahead {readahead}, backend {backend}")
            print(f"sequential read: {frames / dt:.1f} f/s "
                  f"({total / dt / 1e6:.0f} MB/s virtual DNG), {dt:.2f} s")
            print(f"stats: {stats}")
        finally:
            subprocess.run(["fusermount", "-u", mnt], capture_output=True)
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.terminate()
                proc.wait(timeout=15)


if __name__ == "__main__":
    main()
