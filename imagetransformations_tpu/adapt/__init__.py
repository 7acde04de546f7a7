from imagetransformations_tpu.adapt import augmix, evolution, patches, posthoc, refine, tent, tta  # noqa: F401
