"""Batched TPU image ops.

Public per-op API mirrors the reference one-to-one (``apply_scale``,
``apply_rotation``, ...) but every function is batched (NHWC), takes per-image
parameter vectors, and is jit/vmap/shard_map-compatible. Hot paths additionally
have fused Pallas kernels under ``ops.pallas``.
"""

from imagetransformations_tpu.ops.elementwise import (  # noqa: F401
    apply_brightness,
    apply_contrast,
    enhance_color,
    enhance_contrast,
    grayscale,
    invert,
)
from imagetransformations_tpu.ops.noise import (  # noqa: F401
    apply_gaussian_noise,
    gaussian_noise_01,
    impulse_noise,
    shot_noise,
)
from imagetransformations_tpu.ops.stencil import (  # noqa: F401
    apply_blur,
    gaussian_blur,
    motion_blur,
    pil_box_blur,
    pil_gaussian_blur,
    sharpen,
    sobel_edges,
)
from imagetransformations_tpu.ops.warp import (  # noqa: F401
    affine_warp,
    apply_perspective,
    apply_rotation,
    apply_scale,
    apply_scale_batched,
    apply_shear,
    apply_translation,
    center_crop,
    flip_vertical,
    perspective_coeffs,
    perspective_warp,
    random_zoom,
)
from imagetransformations_tpu.ops.histogram import (  # noqa: F401
    histogram_equalization,
    image_entropy,
)
