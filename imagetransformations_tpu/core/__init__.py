from imagetransformations_tpu.core.image import (  # noqa: F401
    as_batch,
    as_float,
    restore_layout,
    to_uint8_rint,
    to_uint8_trunc,
)
from imagetransformations_tpu.core.grids import PARAM_GRIDS, ParamGrid, sample_params  # noqa: F401
