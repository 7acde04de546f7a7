"""Pallas TPU kernels for the hot ops.

XLA already runs fused elementwise chains at HBM speed (~90 Gpix/s/chip
measured on v5e for uint8 in/out), so Pallas is reserved for the patterns XLA
schedules poorly:

- ``blur``:  separable Gaussian with BOTH passes VMEM-resident (one HBM
  read + one write instead of XLA's per-pass materialization).
- ``shear``: per-row fractional shift (dynamic lane slice + lerp) — the
  building block of the 3-shear (Paeth) rotation that replaces XLA's
  pathological gather-based warp (~500ms -> ~1ms per 32x512x512 batch).
- ``megakernel``: the whole blur -> rotate -> grayscale chain VMEM-resident
  per image (one HBM read + one write; in-VMEM f32 transposes between shear
  orientations) — the round-2 headline path, ~2x the round-1 fused chain.

All kernels fall back to interpreter mode off-TPU so the differential tests
run on the CPU backend.
"""

from imagetransformations_tpu.ops.pallas.shear import (  # noqa: F401
    blur_rotate_fused,
    rotate_3shear,
    rotate_3shear_batched,
    shear_rows,
    shear_rows_per_image,
)
from imagetransformations_tpu.ops.pallas.blur import blur_separable, blur_to_sheared_rows  # noqa: F401
from imagetransformations_tpu.ops.pallas.megakernel import fused_blur_rotate_image  # noqa: F401
from imagetransformations_tpu.ops.pallas.rotate_gather import pil_rotate_nearest_batched  # noqa: F401
