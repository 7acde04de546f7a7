"""imagetransformations_tpu — a TPU-native image-transformation + uncertainty framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``aaryaamoharir/ImageTransformations`` (see SURVEY.md at the repo root):

- ``core``     : canonical NHWC uint8/float32 batch tensor model, param grids, PRNG.
- ``oracle``   : CPU (NumPy) re-derivation of the reference's exact PIL/OpenCV
                 semantics; the <=1-LSB differential-test oracle.
- ``ops``      : batched image ops (elementwise / stencil / warp / noise /
                 histogram) as pure jnp functions, with fused Pallas TPU kernels
                 under ``ops.pallas``.
- ``pipeline`` : declarative op-chains, fused batch execution, multi-chip
                 sharding (``jax.sharding.Mesh`` + ``shard_map``), folder I/O.
- ``models``   : Flax classifiers (CIFAR ResNet-20/56, SimpleCNN, ...) with
                 torch-checkpoint weight import and a penultimate-feature tap.
- ``uq``       : vectorized uncertainty metrics + calibration measures.
- ``adapt``    : reverse-FGSM refinement, TENT, TTA, AugMix, angelic patches,
                 post-hoc calibration, evolutionary transform search.
- ``attacks``  : FGSM / PGD / ODIN as pure functional JAX.
- ``evalx``    : corruption-sweep evaluation harness and reporting.
"""

__version__ = "0.1.0"

from imagetransformations_tpu.core.image import (  # noqa: F401
    as_batch,
    as_float,
    to_uint8_rint,
    to_uint8_trunc,
)
