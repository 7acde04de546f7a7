"""Pallas TPU kernels for the hot ops.

XLA already runs fused elementwise chains at HBM speed (~90 Gpix/s/chip
measured on v5e for uint8 in/out), so Pallas is reserved for the patterns XLA
schedules poorly:

- ``blur``:  separable Gaussian with BOTH passes VMEM-resident (one HBM
  read + one write instead of XLA's per-pass materialization).
- ``shear``: per-row fractional shift (dynamic lane slice + lerp) — the
  building block of the 3-shear (Paeth) rotation that replaces XLA's
  pathological gather-based warp (~500ms -> ~1ms per 32x512x512 batch).

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
