"""Multi-chip distribution: batch ("data") sharding over a device mesh.

The transform workload is a pure map over images, so the multi-chip story is
batch-dim sharding over ICI with zero collectives (SURVEY.md SS2.11): lay the
NHWC batch out over a 1-D ``Mesh`` and let pjit partition every op. Metric
reductions (evalx) use ``psum`` inside ``shard_map`` where needed.

The reference's only parallelism is a single torch DataParallel wrap
(attacks/fgsm.py:58); this module is its TPU-native replacement and also
serves the models/uq training paths (dp axis).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagetransformations_tpu.core.jitutil import IdLRUCache

#: jitted shard_map'ped chain executables per (mesh, axis, chain structure)
_CHAIN_FN_CACHE = IdLRUCache(maxsize=16)


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def shard_images(images: jnp.ndarray, mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Place an NHWC batch with the batch dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(images, sharding)


def sharded_apply(
    fn: Callable[..., jnp.ndarray],
    mesh: Mesh,
    axis: str = "data",
) -> Callable[..., jnp.ndarray]:
    """jit ``fn`` with batch-sharded input/output over ``mesh``.

    ``fn`` must be a pure per-batch function (first arg NHWC images); XLA
    partitions every op along the batch dim — zero inter-chip traffic for
    map-style transforms.
    """
    in_sharding = NamedSharding(mesh, P(axis))

    def wrapped(images, *args, **kwargs):
        images = jax.lax.with_sharding_constraint(images, in_sharding)
        out = fn(images, *args, **kwargs)
        return jax.lax.with_sharding_constraint(out, in_sharding)

    return jax.jit(wrapped)


def psum_mean(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-chip mean for metric reductions inside shard_map bodies."""
    return jax.lax.psum(jnp.mean(x), axis_name) / jax.lax.psum(1.0, axis_name)


def sharded_accuracy(logits, labels, mesh: Mesh, axis: str = "data") -> float:
    """Global accuracy over batch-sharded logits/labels WITHOUT gathering.

    Each chip scores its local shard; the only cross-chip traffic is the
    scalar ``psum`` over ICI — the metric-reduction pattern SURVEY §2.11
    calls for (vs the reference's master-device gather in DataParallel,
    attacks/fgsm.py:58). Shards must be equal-sized (device_put with a
    batch-divisible global shape guarantees this).
    """
    fn = _sharded_accuracy_fn(mesh, axis)
    return float(fn(logits, labels))


_ACC_FN_CACHE: dict = {}


def _sharded_accuracy_fn(mesh: Mesh, axis: str):
    # cache the jitted shard_map per (mesh, axis): a fresh closure each call
    # would defeat jax's jit cache and recompile every invocation (75 cells
    # in a full sweep; compiles are server-side on the tunneled runtime)
    key = (mesh, axis)
    fn = _ACC_FN_CACHE.get(key)
    if fn is None:

        def body(lg, lb):
            correct = (jnp.argmax(lg, -1) == lb).astype(jnp.float32)
            return psum_mean(correct, axis)

        fn = jax.jit(
            jax.shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P())
        )
        _ACC_FN_CACHE[key] = fn
    return fn


def sharded_chain_fn(
    chain,
    mesh: Mesh,
    axis: str = "data",
    **build_kwargs,
):
    """Batch-data-parallel FUSED chain: each device runs the whole Pallas
    pipeline (megakernel included) on its local batch shard.

    ``sharded_apply`` relies on XLA partitioning plain jnp ops — fine for
    elementwise chains, but a ``pallas_call`` is a custom call that the
    partitioner does NOT split along the batch grid: with merely-sharded
    operands XLA inserts an all-gather and runs the kernel replicated.
    This wrapper is therefore load-bearing for the fused fast path: it
    ``shard_map``s the chain over ``mesh[axis]`` so every chip launches its
    own kernel on its own shard — a pure map, zero collectives on ICI.

    The global batch must divide the axis size. Returns a jitted
    ``images -> images`` callable; outputs keep the input sharding.

    PER-IMAGE parameter arrays (a length-N ``angle``/``factor``/... vector
    in an OpSpec) are lifted out of the specs and passed to ``shard_map``
    as batch-sharded operands, so each device's chain sees the parameter
    slice matching its image block — a closure-captured global-length
    vector would broadcast-mismatch against the local shard. Routing
    bounds that need concrete values (the traced-rotation budget) are
    computed host-side from the global array and injected as a
    ``max_angle_deg`` hint before shard_map turns the values into tracers.

    Replaces (at scale) the reference's only parallelism, a torch
    DataParallel wrap (attacks/fgsm.py:58); validated bit-identical to the
    unsharded chain on an 8-device mesh (tests/test_models_pipeline.py and
    the driver's dryrun_multichip gate).
    """
    from imagetransformations_tpu.pipeline.chain import (
        OpSpec, _round_budget, build_chain_fn,
    )

    chain = list(chain)
    lifted: list[tuple[int, str]] = []  # (spec index, param key)
    arrays: list[jnp.ndarray] = []
    for si, sp in enumerate(chain):
        new_params = dict(sp.params)
        changed = False
        for k, v in sp.params.items():
            if isinstance(v, (int, float, bool, str)) or v is None:
                continue
            arr = np.asarray(v)
            if arr.ndim < 1:
                new_params[k] = float(arr)  # 0-d array -> plain static scalar
                changed = True
                continue
            lifted.append((si, k))
            arrays.append(jnp.asarray(arr))
            if (
                sp.name == "rotation"
                and k == "angle"
                and "max_angle_deg" not in sp.params
                and float(np.abs(arr).max()) <= 45.0
            ):
                # inject the ROUNDED routing budget so every angle vector
                # within the same 5-degree budget reuses one executable
                new_params["max_angle_deg"] = _round_budget(
                    float(np.abs(arr).max())
                )
                changed = True
        if changed:
            chain[si] = OpSpec(sp.name, new_params)

    # the executable depends only on the chain STRUCTURE (op names, static
    # params incl. the rounded budget, which params are lifted) — cache it
    # so repeated calls with fresh per-image parameter values (passed as
    # operands below, never closure constants) skip retrace + recompile
    chain_key = tuple(
        (
            sp.name,
            tuple(sorted(
                (k, v) for k, v in sp.params.items()
                if isinstance(v, (int, float, bool, str)) or v is None
            )),
        )
        for sp in chain
    )
    extra = (
        axis,
        mesh,  # Mesh hashes by value: fresh-but-equal meshes still hit
        chain_key,
        tuple(lifted),
        tuple(sorted(build_kwargs.items())),
    )
    jitted = _CHAIN_FN_CACHE.get((), extra)
    if jitted is None:
        spec = P(axis)

        def body(x, *vals):
            local = list(chain)
            for (si, k), v in zip(lifted, vals):
                p = dict(local[si].params)
                p[k] = v
                local[si] = OpSpec(local[si].name, p)
            return build_chain_fn(local, jit=False, **build_kwargs)(x)

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the vma checker (on by default) rejects
        jitted = jax.jit(jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec,) * (1 + len(arrays)),
            out_specs=spec,
            check_vma=False,
        ))
        _CHAIN_FN_CACHE.put((), extra, jitted)
    if not arrays:
        return jitted
    arrays_t = tuple(arrays)
    return lambda images: jitted(images, *arrays_t)
