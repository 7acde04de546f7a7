"""CPU oracle: exact NumPy re-derivations of the reference's PIL/OpenCV semantics.

These functions are the ground truth for the framework's differential tests
(<= 1-LSB gate, SURVEY.md SS4/SS7). They are *re-derived* from the reference's
observable behavior — each docstring cites the reference file:line whose
semantics it reproduces — and are themselves validated against PIL/cv2 directly
in ``tests/test_oracle_vs_pil.py``.
"""

from imagetransformations_tpu.oracle import elementwise, stencil, warp  # noqa: F401
