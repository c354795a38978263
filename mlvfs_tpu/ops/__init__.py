from .luts import (  # noqa: F401
    EV_RESOLUTION,
    raw2ev_lut,
    ev2raw_lut,
    raw2ev_lut20,
    ev2raw_lut20,
)
from .unpack import unpack_frame, unpack_batch  # noqa: F401
