from imagetransformations_tpu.uq import metrics, calibration, mc  # noqa: F401
from imagetransformations_tpu.uq.metrics import (  # noqa: F401
    doctor_alpha,
    doctor_beta,
    energy_score,
    least_confidence,
    margin,
    max_logit,
    msp,
    ratio,
    renyi_entropy,
    shannon_entropy,
    tsallis_entropy,
)
