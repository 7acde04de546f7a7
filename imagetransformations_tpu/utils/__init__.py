from imagetransformations_tpu.utils.config import FrameworkConfig, RefineConfig, SweepConfig  # noqa: F401
from imagetransformations_tpu.utils.profiling import op_throughput, trace  # noqa: F401
from imagetransformations_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
