from .mesh import make_mesh, shard_batch, frames_sharding  # noqa: F401
