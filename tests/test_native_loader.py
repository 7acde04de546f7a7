"""Native C++ data loader: decode parity vs PIL (same system libjpeg/libpng)."""

import os

import numpy as np
import pytest
from PIL import Image

from imagetransformations_tpu.pipeline.native_io import (
    decode_batch,
    load_folder_images_native,
    native_available,
)


@pytest.fixture
def image_dir(tmp_path, rng):
    for i, (size, fmt) in enumerate([((40, 30), "PNG"), ((64, 64), "JPEG"), ((100, 50), "JPEG")]):
        img = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"im{i}.{fmt.lower()}", format=fmt)
    return tmp_path


def test_decode_batch_exact_vs_pil(image_dir):
    paths = sorted(str(p) for p in image_dir.iterdir())
    # decode at native size: same system codecs as PIL -> bit-exact
    for p in paths:
        ref = np.asarray(Image.open(p).convert("RGB"))
        out = decode_batch([p], (ref.shape[1], ref.shape[0]))
        np.testing.assert_array_equal(out[0], ref)


def test_decode_batch_resized_matches_cv2(image_dir):
    """The loader's resize is point-sampled bilinear (cv2 INTER_LINEAR
    convention); PIL's downscale is area-filtered (antialiased), so cv2 is
    the matching reference."""
    import cv2

    paths = sorted(str(p) for p in image_dir.iterdir())
    out = decode_batch(paths, (32, 32), n_threads=2)
    assert out.shape == (3, 32, 32, 3)
    for i, p in enumerate(paths):
        src = np.asarray(Image.open(p).convert("RGB"))
        ref = cv2.resize(src, (32, 32), interpolation=cv2.INTER_LINEAR)
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


def test_load_folder_native(image_dir):
    batch, paths = load_folder_images_native(str(image_dir), (16, 16))
    assert batch.shape == (3, 16, 16, 3)
    assert len(paths) == 3


def test_missing_file_raises_or_falls_back(image_dir):
    if not native_available():
        pytest.skip("native loader unavailable")
    with pytest.raises(IOError):
        decode_batch([str(image_dir / "nope.jpeg")], (8, 8))


def test_native_encode_roundtrip(tmp_path, rng):
    """itt_encode_batch: multithreaded libjpeg encode; decode back within
    normal JPEG loss, and byte-compatible with PIL (same libjpeg, q=75)."""
    from imagetransformations_tpu.pipeline.native_io import encode_batch

    base = rng.integers(90, 110, (3, 48, 48, 3)).astype(np.uint8)
    paths = [str(tmp_path / f"im{i}.jpeg") for i in range(3)]
    encode_batch(base, paths, quality=95, n_threads=2)
    back = decode_batch(paths, (48, 48))
    assert np.abs(back.astype(int) - base.astype(int)).max() <= 24  # jpeg loss


def test_save_batch_images_native(tmp_path, rng):
    from imagetransformations_tpu.pipeline.io import save_batch_images

    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    save_batch_images(imgs, ["a.png", "b.png"], str(tmp_path), "x", native=True)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["a_x.jpeg", "b_x.jpeg"]
