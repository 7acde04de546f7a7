from imagetransformations_tpu.evalx.harness import (  # noqa: F401
    CORRUPTIONS,
    analyze_uncertainty_thresholds,
    corrupt,
    corruption_sweep,
    evaluate_batched,
    evaluate_sharded,
)
