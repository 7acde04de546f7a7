"""ctypes bindings for the native C++ data loader (native/loader.cpp).

The runtime-I/O component: multithreaded libjpeg/libpng decode + bilinear
resize straight into one NHWC uint8 batch buffer — the TPU-native replacement
for the reference's ``DataLoader(num_workers=N)`` worker pools
(e.g. attacks/uncertainty/FINAL_cifar_corrupted.py:210).

The shared library is built on first use (g++, links system libjpeg/libpng);
every entry point falls back to the PIL path in pipeline.io when the native
build is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libittloader.so")
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.itt_decode_batch.restype = ctypes.c_int
        lib.itt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        if hasattr(lib, "itt_encode_batch"):
            lib.itt_encode_batch.restype = ctypes.c_int
            lib.itt_encode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
        _lib = lib
    except OSError:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def decode_batch(
    paths: list[str], size: tuple[int, int], n_threads: int = 4
) -> np.ndarray:
    """Decode + resize a list of image files -> NHWC uint8 [N, H, W, 3].

    size = (width, height) to match PIL's resize convention. Falls back to
    PIL when the native library can't be built.
    """
    w, h = size
    lib = _get_lib()
    if lib is None:
        from PIL import Image

        out = np.empty((len(paths), h, w, 3), np.uint8)
        for i, p in enumerate(paths):
            out[i] = np.asarray(
                Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR), np.uint8
            )
        return out
    out = np.empty((len(paths), h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.itt_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, n_threads,
    )
    if failures:
        raise IOError(f"native loader failed to decode {failures} of {len(paths)} files")
    return out


def encode_batch(
    images: np.ndarray, paths: list[str], quality: int = 75, n_threads: int = 4
) -> None:
    """JPEG-encode an NHWC uint8 batch to per-image file paths.

    Multithreaded libjpeg (quality default 75 = PIL's default). Falls back
    to PIL when the native library can't be built. An old cached
    libittloader.so without the encoder entry point also falls back (delete
    native/libittloader.so to rebuild).
    """
    images = np.ascontiguousarray(np.asarray(images, np.uint8))
    n, h, w, c = images.shape
    assert c == 3 and len(paths) == n
    lib = _get_lib()
    if lib is None or not hasattr(lib, "itt_encode_batch"):
        from PIL import Image

        for img, p in zip(images, paths):
            Image.fromarray(img).save(p, quality=quality)
        return
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.itt_encode_batch(
        arr, n, images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, quality, n_threads,
    )
    if failures:
        raise IOError(f"native encoder failed on {failures} of {n} files")


def load_folder_images_native(
    root: str, size: tuple[int, int], n_threads: int = 4
) -> tuple[np.ndarray, list[str]]:
    """Native-decode an image folder -> (NHWC uint8 batch, paths)."""
    from imagetransformations_tpu.pipeline.io import walk_image_files

    paths = walk_image_files(root)
    if not paths:
        return np.zeros((0, size[1], size[0], 3), np.uint8), []
    return decode_batch(paths, size, n_threads), paths
