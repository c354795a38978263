"""Measure the sharded host gather: staged copy vs zero-copy views.

VERDICT r4 task 6: --devices>1 used to re-pay the staged batch copy
(_gather_packed_batch) that r4 eliminated for the unsharded path. The
zero-copy replacement (_put_views_sharded) feeds per-device shards straight
from the chunk memmap views via make_array_from_single_device_arrays. This
harness records the host-leg cost of both on an 8-virtual-device CPU mesh
at the engine geometry (1080p, 14bpp, batch 16).

Legs reported (ms/frame, median of reps):
  gather_staged   _gather_packed_batch alone — the host payload copy
  gather_views    _gather_packed_views alone — memmap view construction
  put_staged      staged gather + sharded jax.device_put, blocked
  put_zero_copy   view gather + _put_views_sharded, blocked

Caveat: on the CPU backend a device_put is itself a host memcpy, so the
end-to-end legs understate the TPU win (where the DMA engine reads the page
cache and the host copy is the only real host cost). The gather-only legs
are backend-independent and are the recorded number.

Run:  python tools/profile_sharded_gather.py [frames=64] [reps=20]
"""

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the container's sitecustomize (via PYTHONPATH) wires the remote-TPU PJRT
# plugin into every interpreter; re-exec with a clean env so CPU JAX with 8
# virtual devices initializes locally (same trick as the root conftest)
if os.environ.get("_SG_CLEAN") != "1":
    env = {
        k: v
        for k, v in os.environ.items()
        if not (k.startswith(("AXON_", "PALLAS_AXON", "TPU_")) or k == "PYTHONPATH")
    }
    env["_SG_CLEAN"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = REPO
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, REPO)

import jax  # noqa: E402


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from mlvfs_tpu.format import synth
    from mlvfs_tpu.format.reader import MLVClip
    from mlvfs_tpu.pipeline.config import ProcessingConfig
    from mlvfs_tpu.pipeline.convert import ClipConverter

    B = 16
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "SG.MLV")
        synth.write_mlv(src, width=1920, height=1080, frames=frames)
        eng = ClipConverter(
            MLVClip(src), ProcessingConfig(batch_size=B, shard_devices=8)
        )
        batches = [list(range(i, i + B)) for i in range(0, frames - B + 1, B)]

        def timeleg(name, fn, block):
            # warm (page cache + ring buffers + compile)
            for idx in batches:
                r = fn(idx)
                if block:
                    r.block_until_ready()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                for idx in batches:
                    r = fn(idx)
                    if block:
                        r.block_until_ready()
                ts.append((time.perf_counter() - t0) / (len(batches) * B))
            med = statistics.median(ts) * 1e3
            best = min(ts) * 1e3
            print(f"{name:16s} median {med:7.3f} ms/frame   best {best:7.3f}")
            return med

        timeleg("gather_staged", eng._gather_packed_batch, block=False)
        timeleg("gather_views", eng._gather_packed_views, block=False)
        timeleg(
            "put_staged",
            lambda idx: eng._put(eng._gather_packed_batch(idx)),
            block=True,
        )
        timeleg(
            "put_zero_copy",
            lambda idx: eng._put_views_sharded(eng._gather_packed_views(idx)),
            block=True,
        )
        print(f"devices={len(jax.devices())} geometry=1920x1080x14bpp batch={B}")


if __name__ == "__main__":
    main()
