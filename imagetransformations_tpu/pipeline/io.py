"""Host-side data I/O: folder walkers, CIFAR-10-C npy loaders, device prefetch.

TPU-native rebuild of the reference's L0 layer:
- ``load_folder_images``  <- transformation.py:73-89 (walk dir for images)
- ``load_cifar10c_npy``   <- transformation.py:19-71 (npy corruption tensors,
  fixed severity sample indices) and FINAL_cifar_corrupted.py:45-48
  (sev*10000 slicing)
- ``prefetch_to_device``  <- DataLoader(num_workers=N) equivalent: a
  double-buffered background-thread pipeline that overlaps host decode with
  device compute (SURVEY.md SS2.11 last row).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Iterator

import numpy as np

import jax

IMAGE_EXTS = (".jpeg", ".jpg", ".png")

#: transformation.py:33 — one sample index per severity block of 1001
SEVERITY_SAMPLE_INDICES = (0, 1001, 2002, 3003, 4004)


def walk_image_files(root: str, exts: tuple[str, ...] = IMAGE_EXTS) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(exts):
                out.append(os.path.join(dirpath, f))
    return out


def shard_files_for_host(
    paths: list[str],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[str]:
    """Deterministic per-host slice of a global file list (multi-host I/O).

    The multi-host form of the transform workload (SURVEY §2.11/§5): each
    host walks the same folder, takes its contiguous slice, decodes and
    feeds only its own chips — file bytes never cross DCN; only the
    already-sharded device arrays participate in collectives. Defaults to
    ``jax.process_index()/count()`` so single-process runs see the full
    list unchanged; pass explicit values to test or to shard by other
    topologies. Contiguous (not strided) slicing keeps each host's reads
    sequential on shared filesystems. Shard sizes stay within 1 file of
    each other (balanced ``idx*n//cnt`` bounds).

    The reference has no counterpart (single-process folder loops,
    transformation.py:73-89); this is the DCN-side half of the data-
    parallel story, paired with ``prefetch_to_device`` per host.
    """
    idx = jax.process_index() if process_index is None else int(process_index)
    cnt = jax.process_count() if process_count is None else int(process_count)
    if cnt <= 1:
        return list(paths)
    if not 0 <= idx < cnt:
        raise ValueError(f"process_index {idx} outside [0, {cnt})")
    # balanced contiguous split: every shard within 1 file of the others
    # (a floor-division split would hand the last host up to cnt-1 extras,
    # stalling peers at the first collective while it finishes decoding)
    start = idx * len(paths) // cnt
    stop = (idx + 1) * len(paths) // cnt
    return list(paths[start:stop])


def global_batch_from_host_shards(
    local_batch: np.ndarray, mesh, axis: str = "data"
) -> jax.Array:
    """Assemble per-host local batches into one globally-sharded jax.Array.

    Each host contributes its ``local_batch`` (rows decoded from its
    ``shard_files_for_host`` slice); the result is a global array whose
    batch dim is sharded over ``mesh[axis]`` across ALL hosts' devices —
    the input format ``evaluate_sharded``/``sharded_chain_fn`` consume.
    Single-host meshes degenerate to a plain ``device_put``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def load_folder_images(
    root: str, size: tuple[int, int] | None = None, native: bool = False
) -> tuple[np.ndarray, list[str]]:
    """Load a folder of images as one NHWC uint8 batch (+ their paths).

    Images are optionally resized (PIL bilinear) to a common size; without
    ``size`` all images must already share a shape. ``native=True`` routes
    through the multithreaded C++ decoder (pipeline.native_io; requires
    ``size``), falling back to PIL when the native build is unavailable.
    """
    from PIL import Image

    if native and size is not None:
        from imagetransformations_tpu.pipeline.native_io import load_folder_images_native

        return load_folder_images_native(root, size)

    paths = walk_image_files(root)
    arrs = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        if size is not None:
            img = img.resize(size, Image.BILINEAR)
        arrs.append(np.asarray(img, np.uint8))
    if not arrs:
        return np.zeros((0, 0, 0, 3), np.uint8), []
    return np.stack(arrs), paths


def load_cifar10c_npy(
    path: str, severity: int | None = None, sample_only: bool = False
) -> np.ndarray:
    """Load one CIFAR-10-C corruption file -> NHWC uint8.

    Layout: [50000, 32, 32, 3] = 5 severities x 10000 images
    (FINAL_cifar_corrupted.py:45-48). ``severity`` in 1..5 slices one block;
    ``sample_only`` returns the reference's 5 preview indices
    (transformation.py:33).
    """
    arr = np.load(path, mmap_mode="r")
    if arr.ndim == 4 and arr.shape[1] == 3 and arr.shape[-1] != 3:
        arr = np.transpose(arr, (0, 2, 3, 1))  # CHW -> HWC (transformation.py:41-43)
    if sample_only:
        return np.asarray(arr[list(SEVERITY_SAMPLE_INDICES)])
    if severity is not None:
        lo = (severity - 1) * 10000
        return np.asarray(arr[lo : lo + 10000])
    return np.asarray(arr)


def export_corruption_samples(root: str, out_dir: str) -> list[str]:
    """Save one preview PNG per (corruption, severity) from CIFAR-10-C npys.

    transformation.py:19-71 parity: walks for .npy files, slices the fixed
    severity sample indices, writes ``store/``-style PNGs.
    """
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, path in iter_corruption_files(root):
        samples = load_cifar10c_npy(path, sample_only=True)
        for sev, img in enumerate(samples, start=1):
            fn = os.path.join(out_dir, f"{name}_severity{sev}.png")
            Image.fromarray(img).save(fn)
            written.append(fn)
    return written


def iter_corruption_files(root: str) -> Iterator[tuple[str, str]]:
    """Yield (corruption_name, path) for every .npy under root (labels.npy excluded)."""
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".npy") and f != "labels.npy":
                yield os.path.splitext(f)[0], os.path.join(dirpath, f)


def batched(arr: np.ndarray, batch_size: int) -> Iterator[np.ndarray]:
    for i in range(0, len(arr), batch_size):
        yield arr[i : i + batch_size]


def prefetch_to_device(
    host_batches: Iterable, buffer_size: int = 2, device=None
) -> Iterator:
    """Double-buffered host->device prefetch.

    A background thread stages upcoming host batches onto the device while the
    current batch computes — the TPU equivalent of DataLoader worker prefetch.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    end = object()

    def producer():
        try:
            for b in host_batches:
                q.put(jax.device_put(b, device))
        finally:
            q.put(end)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is end:
            return
        yield item


def save_batch_images(
    images: np.ndarray,
    paths: list[str],
    out_dir: str,
    suffix: str,
    native: bool = False,
) -> None:
    """Write an NHWC uint8 batch back to disk (parity with transformation.py:160-162).

    ``native=True`` routes through the multithreaded C++ libjpeg encoder
    (pipeline/native_io.encode_batch); default stays on PIL for byte-level
    reproducibility with the reference's saved outputs.
    """
    os.makedirs(out_dir, exist_ok=True)
    out_paths = [
        os.path.join(
            out_dir, f"{os.path.splitext(os.path.basename(p))[0]}_{suffix}.jpeg"
        )
        for p in paths
    ]
    if native:
        from imagetransformations_tpu.pipeline.native_io import encode_batch

        encode_batch(np.asarray(images), out_paths)
        return
    from PIL import Image

    for img, op in zip(np.asarray(images), out_paths):
        Image.fromarray(img).save(op)
