#!/usr/bin/env python
"""transformation.py __main__ equivalent: folder -> 8-transform sweep -> jpegs."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from imagetransformations_tpu.utils.config import FrameworkConfig
from imagetransformations_tpu.workflows import transform_folder

if __name__ == "__main__":
    cfg = FrameworkConfig.from_cli()
    explicit = len(sys.argv) > 1 and not sys.argv[1].startswith("--")
    in_dir = sys.argv[1] if explicit else "./photos"
    exts = (".jpg", ".jpeg", ".png")
    has_images = os.path.isdir(in_dir) and any(
        f.lower().endswith(exts) for f in os.listdir(in_dir)
    )
    if not has_images and explicit:
        # a user-supplied path that is missing/empty is an error (never
        # create or fill a possibly-typo'd directory with demo noise)
        sys.exit(f"error: no images found in {in_dir!r}")
    if not has_images:
        # default ./photos absent or empty: synthesize a small demo set
        # (other examples use synthetic data too) instead of silently
        # writing nothing
        import numpy as np
        from PIL import Image

        os.makedirs(in_dir, exist_ok=True)
        rng = np.random.default_rng(cfg.seed)
        for i in range(4):
            arr = rng.integers(0, 256, (160, 224, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(os.path.join(in_dir, f"demo{i}.jpeg"))
        print(f"created {in_dir} with 4 synthetic jpegs")
    out_dir = in_dir.rstrip("/") + "_transformed"
    written = transform_folder(in_dir, out_dir, jax.random.key(cfg.seed))
    total = sum(len(v) for v in written.values())
    print(f"wrote {total} transformed images to {out_dir}")
