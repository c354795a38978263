"""Device meshes and multi-chip sharding.

The reference's only parallelism is a FUSE thread pool decoding independent
frames concurrently (SURVEY.md section 2.4). The TPU-native equivalent is a
1-D device mesh over the *frame* axis: batches of packed frames are sharded
across chips (pure data parallelism — frames are independent), and the few
cross-frame reductions (per-clip stripe calibration, dual-ISO exposure fits)
become XLA collectives over the same mesh.

No NCCL/MPI analogue is needed: `jax.jit` with sharded inputs inserts ICI
collectives automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frames"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (FRAME_AXIS,))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis across the mesh."""
    return NamedSharding(mesh, P(FRAME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(fn, mesh: Mesh, donate: bool = False):
    """jit ``fn(batch, *consts)`` with the batch sharded over the mesh.

    ``fn`` must be shape-polymorphic over the leading axis only in the sense
    that per-frame work is independent; XLA partitions it with no collectives
    unless the function reduces across frames (e.g. clip calibration), in
    which case the reduction rides ICI.
    """
    sharding = frames_sharding(mesh)

    jitted = jax.jit(
        fn,
        in_shardings=(sharding,),
        out_shardings=sharding,
        donate_argnums=(0,) if donate else (),
    )
    return jitted


def device_count_for_batch(batch_size: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    return n if batch_size % n == 0 else 1
