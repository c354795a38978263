from .mesh import (  # noqa: F401
    FRAME_AXIS,
    batch_target,
    frames_sharding,
    make_mesh,
    pad_frames,
    replicated,
)
