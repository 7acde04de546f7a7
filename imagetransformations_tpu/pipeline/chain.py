"""Declarative op-chains compiled to fused TPU executables.

A ``Chain`` is a list of ``OpSpec`` (name + params). ``build_chain_fn``
compiles it into one jitted NHWC->NHWC function with two fusion rules:

1. **Affine fusion**: maximal runs of affine warps (rotate / translate / zoom /
   flip / shear-in-place) collapse into a *single* inverse-map gather by 3x3
   matrix composition — one resampling instead of k (better quality AND one
   memory pass).
2. **f32 streaming**: elementwise/stencil stages keep f32 intermediates; uint8
   quantization happens once at the end. ``strict_parity=True`` instead
   quantizes after every op, bit-matching the reference's PIL-image-at-a-time
   semantics (transformation.py:92-170 applies each op to a uint8 image).

This replaces the reference's per-image Python loop over ops with one
compiled executable over the whole batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import histogram as hg
from imagetransformations_tpu.ops import noise as nz
from imagetransformations_tpu.ops import stencil as st
from imagetransformations_tpu.ops import warp as wp


@dataclasses.dataclass(frozen=True)
class OpSpec:
    """One stage of a transform chain: op name + static/traced params."""

    name: str
    params: dict[str, Any] = dataclasses.field(default_factory=dict)


Chain = Sequence[OpSpec]

#: ops expressible as an inverse-map affine matrix (fusable into one gather)
_AFFINE_OPS = {"rotation", "translation", "zoom", "flip_vertical"}


def _affine_matrix(spec: OpSpec, w: int, h: int) -> jnp.ndarray:
    if spec.name == "rotation":
        # rotation_matrix already encodes apply_rotation's sign convention
        return wp.rotation_matrix(spec.params["angle"], w, h)
    if spec.name == "translation":
        tx = spec.params["tx"]
        ty = spec.params.get("ty", tx)
        return wp.translation_matrix(tx, ty)
    if spec.name == "zoom":
        return wp.zoom_matrix(spec.params["factor"], w, h)
    if spec.name == "flip_vertical":
        return jnp.asarray([[1.0, 0.0, 0.0, 0.0, -1.0, float(h)]], jnp.float32)
    raise ValueError(spec.name)


def _apply_simple(x: jnp.ndarray, spec: OpSpec, key) -> jnp.ndarray:
    p = spec.params
    if spec.name == "brightness":
        return ew.apply_brightness(x, p["factor"])
    if spec.name == "lighten_darken":
        return ew.apply_brightness(x, p["factor"])
    if spec.name == "contrast":
        return ew.apply_contrast(x, p["alpha"])
    if spec.name == "grayscale":
        return ew.grayscale(x)
    if spec.name == "invert":
        return ew.invert(x)
    if spec.name == "enhance_contrast":
        return ew.enhance_contrast(x, p["factor"])
    if spec.name == "enhance_color":
        return ew.enhance_color(x, p["factor"])
    if spec.name == "sharpness":
        return st.sharpen(x, p["factor"])
    if spec.name == "blur":
        return st.apply_blur(x, p["radius"])
    if spec.name == "motion_blur":
        return st.motion_blur(x, p["ksize"])
    if spec.name == "gaussian_noise":
        return nz.apply_gaussian_noise(x, p["std"], key=key)
    if spec.name == "impulse_noise":
        return nz.impulse_noise(x, p["amount"], key=key)
    if spec.name == "shot_noise":
        return nz.shot_noise(x, p["lam"], key=key)
    if spec.name == "histogram_equalization":
        return hg.histogram_equalization(x)
    if spec.name == "scale":
        return wp.apply_scale(x, p["factor"])
    if spec.name == "shear":
        return wp.apply_shear(x, p["factor"])
    # affine ops reached in strict_parity mode (each op applied separately
    # with per-op uint8 quantization, exactly like the reference's PIL calls)
    if spec.name == "rotation":
        return wp.apply_rotation(x, p["angle"], max_angle_deg=p.get("max_angle_deg"))
    if spec.name == "translation":
        return wp.apply_translation(x, p["tx"], p.get("ty", p["tx"]))
    if spec.name == "zoom":
        return wp.random_zoom(x, p["factor"])
    if spec.name == "flip_vertical":
        return wp.flip_vertical(x)
    raise ValueError(f"unknown op {spec.name!r}")


def _static(v) -> bool:
    return isinstance(v, (int, float))


def _inspectable_angles(v):
    """Concrete per-image angle array (not an enclosing-jit tracer) with a
    usable routing bound, else None."""
    import jax

    if _static(v) or isinstance(v, jax.core.Tracer):
        return None
    arr = np.asarray(v)
    if arr.size == 0 or float(np.abs(arr).max()) > 45.0:
        return None
    return arr


def _match_mega(chain, i, strict_parity, x):
    """Match a blur / rotation / blur->rotation prefix (each optionally
    followed by grayscale) for the VMEM-resident mega-kernels.

    Returns (radius, angle_or_angles, grayscale_out, ops_consumed, bound)
    or None. A non-None ``bound`` means per-image traced angles routed to
    the log-routing kernel variant with that static budget: either a
    concrete bounded angle array, or an enclosing-jit TRACER whose caller
    declared ``max_angle_deg`` in the rotation spec's params (the only safe
    way to route an uninspectable angle — ``sharded_chain_fn`` injects the
    hint from the concrete global array before shard_map hides it).
    """
    import jax as _jax

    if strict_parity or x.ndim != 4 or x.dtype != jnp.uint8:
        return None
    radius, angle, bound = 0.0, 0.0, None
    j = i
    if chain[j].name == "blur" and _static(chain[j].params["radius"]):
        radius = float(chain[j].params["radius"])
        j += 1
    if j < len(chain) and chain[j].name == "rotation":
        a = chain[j].params["angle"]
        hint = chain[j].params.get("max_angle_deg")
        if _static(a) and abs(float(a)) <= 45.0:
            angle = float(a)
            j += 1
        else:
            arr = _inspectable_angles(a)
            if arr is not None:
                angle = arr
                bound = _round_budget(float(np.abs(arr).max()))
                j += 1
            elif (
                isinstance(a, _jax.core.Tracer)
                and hint is not None
                and float(hint) <= 45.0
            ):
                angle = a
                bound = _round_budget(float(hint))
                j += 1
    if j == i:
        return None
    gray = j < len(chain) and chain[j].name == "grayscale" and x.shape[3] == 3
    if gray:
        j += 1
    return radius, angle, gray, j - i, bound


def _round_budget(max_abs_deg: float) -> float:
    """Routing budget rounded up to 5-degree steps: one compiled kernel
    specialization per budget instead of per distinct angle vector."""
    return min(45.0, 5.0 * float(np.ceil(max_abs_deg / 5.0))) or 5.0


def _fast_compile_spec(chain: Chain):
    """(radius, angle, grayscale_out) when the WHOLE chain is the fused
    blur -> rotation(static, nonzero, |a|<=45) [-> grayscale] stage —
    the only shape where fast_compile can share an executable across
    angles (see build_chain_fn docstring) — else None.

    MUST stay a strict subset of ``_match_mega``'s static-angle matching
    (guarded by test_megakernel.test_fast_compile_spec_subset_of_match_mega):
    anything accepted here would otherwise route the static megakernel, so
    divergence silently changes which kernel a chain runs. Deliberate
    differences: angle 0 is rejected (a no-shear static kernel compiles
    fast — sharing buys nothing), traced/array angles are rejected (they
    already share via _match_mega's bound path), and the grayscale channel
    check happens at call time in fc_fn (x is unknown here)."""
    i, radius = 0, 0.0
    if (
        i < len(chain)
        and chain[i].name == "blur"
        and _static(chain[i].params.get("radius"))
    ):
        radius = float(chain[i].params["radius"])
        i += 1
    if i >= len(chain) or chain[i].name != "rotation":
        return None
    a = chain[i].params.get("angle")
    if not _static(a) or float(a) == 0.0 or abs(float(a)) > 45.0:
        return None
    angle = float(a)
    i += 1
    gray = i < len(chain) and chain[i].name == "grayscale"
    if gray:
        i += 1
    return (radius, angle, gray) if i == len(chain) else None


def build_chain_fn(
    chain: Chain,
    *,
    strict_parity: bool = False,
    warp_method: str = "bilinear",
    jit: bool = True,
    fast_compile: bool = False,
) -> Callable[[jnp.ndarray, jax.Array | None], jnp.ndarray]:
    """Compile a chain into ``fn(images, key=None) -> images``.

    With ``strict_parity=False`` (default, fast path) adjacent affine ops are
    fused into single gathers and intermediates stay f32. With True, every op
    quantizes to uint8 semantics exactly like the reference's sequential PIL
    calls.

    ``fast_compile=True`` trades steady-state throughput for cold-compile
    latency when the WHOLE chain is the fused blur->rotate(->grayscale)
    stage with a static nonzero angle: the chain then runs as a host-side
    call into the log-routed per-image-angle kernel's own jit, with the
    angle vector as a RUNTIME operand — ONE executable per (shape,
    radius, 5-degree budget) serves EVERY angle, so a sweep over N angles
    pays one ~3 min Mosaic compile instead of N x 2-4 min static-angle
    specializations (PERF.md 'compile latency'). An enclosing outer jit
    would constant-fold the angle back into a per-angle executable, which
    is exactly why this path skips the chain-level jit (the kernel call
    IS the chain; there is nothing else to fuse). Chains with additional
    surrounding ops fall back to the normal fused build (fast_compile is
    a no-op there — sharing is impossible once the outer trace bakes the
    constant in). Throughput cost ~0.6-0.75x (sustained 8.4-10.4 vs 14.0
    Gpix/s at 512 — PERF.md 'traced-angle band note').
    Device-side f32 shift computation may flip measure-zero truncation
    boundaries by <=1 LSB vs the host-shift static kernel (same budget as
    tests/test_megakernel.py::test_traced_angle_megakernel_matches_static).

    When every chain parameter is a plain scalar, the jitted function is
    CACHED by (chain values, flags): repeated ``build_chain_fn`` calls for
    the same chain reuse one executable instead of re-tracing a fresh
    closure each time. Chains carrying per-image arrays are not cached
    here (their routing inspects concrete values; ``sharded_chain_fn``
    and ``batch._apply_all_fn`` cache those paths at their own level).
    """
    chain = list(chain)
    if fast_compile and not strict_parity and jit:
        fc = _fast_compile_spec(chain)
        if fc is not None:
            radius_fc, angle_fc, gray_fc = fc
            budget_fc = _round_budget(abs(angle_fc))

            from imagetransformations_tpu.ops.pallas.megakernel import (
                fused_blur_rotate_batched,
            )

            def fc_fn(images: jnp.ndarray, key: jax.Array | None = None):
                if (
                    images.ndim == 4
                    and images.dtype == jnp.uint8
                    and (not gray_fc or images.shape[3] == 3)
                ):
                    # host-side numpy vector (never eager jnp: ~40 ms/op on
                    # the tunnel) into the kernel's OWN jit, where the
                    # angle is a runtime operand — this is what shares the
                    # executable across angles; any outer jit here would
                    # constant-fold it back into a per-angle trace
                    av = np.full((images.shape[0],), angle_fc, np.float32)
                    return fused_blur_rotate_batched(
                        images, radius_fc, av, grayscale_out=gray_fc,
                        stream=True, max_angle_deg=budget_fc,
                    )
                # dtype/shape the kernel can't take: the normal fused build
                return build_chain_fn(
                    chain, strict_parity=strict_parity,
                    warp_method=warp_method, jit=jit,
                )(images, key)

            return fc_fn
        # not the pure fused-stage shape: sharing is impossible (the outer
        # trace would bake the angle in) — fall through to the normal build
    cache_key = None
    if jit:
        try:
            cache_key = (
                tuple(
                    (sp.name, tuple(sorted(sp.params.items())))
                    for sp in chain
                ),
                # fast_compile is NOT part of the key: past this point the
                # build is identical to the default one (the fast_compile
                # special case returned above)
                strict_parity,
                warp_method,
            )
            hash(cache_key)
        except TypeError:
            cache_key = None  # unhashable (array params): uncached path
        if cache_key is not None:
            hit = _BUILT_CHAIN_CACHE.get((), (cache_key,))
            if hit is not None:
                return hit

    def fn(images: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        x = images
        n = x.shape[0] if x.ndim == 4 else 1
        h, w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
        keys = (
            jax.random.split(key, len(chain))
            if key is not None
            else [None] * len(chain)
        )
        i = 0
        while i < len(chain):
            spec = chain[i]
            mega = _match_mega(chain, i, strict_parity, x)
            if mega is not None:
                # whole-pipeline-per-image mega-kernel (pallas/megakernel.py):
                # blur -> 3-shear rotate -> grayscale fully VMEM-resident, one
                # HBM read + one write; any H/W (pads internally)
                from imagetransformations_tpu.ops.pallas.megakernel import (
                    fused_blur_rotate_image,
                )

                radius, angle, fuse_gray, consumed, bound = mega
                # stream=True implements this chain's documented fast-mode
                # contract (f32 intermediates, ONE final quantization) for
                # the fused stage: higher quality than per-op rounding and
                # ~4 fewer VPU passes. Oracle: fast_warp.fused_stream_chain.
                if bound is not None:
                    from imagetransformations_tpu.ops.pallas.megakernel import (
                        fused_blur_rotate_batched,
                    )

                    # per-image angles: log-routed kernel, one executable
                    # per routing budget (_round_budget)
                    x = fused_blur_rotate_batched(
                        x, radius, jnp.asarray(angle, jnp.float32),
                        grayscale_out=fuse_gray, stream=True,
                        max_angle_deg=bound,
                    )
                else:
                    x = fused_blur_rotate_image(
                        x, radius, angle, grayscale_out=fuse_gray, stream=True
                    )
                i += consumed
            elif not strict_parity and spec.name in _AFFINE_OPS:
                # collect the maximal affine run; fuse MULTI-op runs into one
                # gather (one resampling instead of k). Single ops go to their
                # dedicated implementations — static translation is a canvas
                # copy, flips are jnp.flip, zoom has a gather-free kernel;
                # the gather warp costs 0.26-0.84 s per 32x512x512 batch.
                j = i + 1
                while j < len(chain) and chain[j].name in _AFFINE_OPS:
                    j += 1
                if j == i + 1:
                    if spec.name == "rotation":
                        # only rotations the kernels rejected reach here:
                        # static |angle|>45, float images, enclosing-jit
                        # TRACERS, and concrete angle arrays beyond the
                        # +-45 routing budget. The matrix warp handles
                        # traced angle arrays and any magnitude correctly
                        # (rotation_matrix is batched) — routing them to a
                        # roll/select kernel past its pad budget would
                        # silently wrap garbage into the image, and
                        # apply_rotation's PIL-parity NEAREST gather costs
                        # ~525 ms/batch
                        x = wp.affine_warp(
                            x, _affine_matrix(spec, w, h), method=warp_method, fill=0.0
                        )
                    else:
                        x = _apply_simple(x, spec, keys[i])
                else:
                    # compose_matrices(later, earlier): warp(m_a) then
                    # warp(m_b) == one warp(compose_matrices(m_b, m_a)), so
                    # each later op's matrix goes in the FIRST slot
                    m = _affine_matrix(spec, w, h)
                    for spec2 in chain[i + 1 : j]:
                        m = wp.compose_matrices(_affine_matrix(spec2, w, h), m)
                    x = wp.affine_warp(x, m, method=warp_method, fill=0.0)
                i = j
            elif (
                not strict_parity
                and spec.name == "blur"
                and isinstance(spec.params["radius"], (int, float))
                and x.dtype == jnp.uint8
            ):
                from imagetransformations_tpu.ops.pallas.blur import blur_separable

                x = blur_separable(x, float(spec.params["radius"]))
                i += 1
            else:
                x = _apply_simple(x, spec, keys[i])
                i += 1
        return x

    if not jit:
        return fn
    jitted = jax.jit(fn)
    if cache_key is not None:
        _BUILT_CHAIN_CACHE.put((), (cache_key,), jitted)
    return jitted


from imagetransformations_tpu.core.jitutil import IdLRUCache

#: value-keyed LRU of jitted all-scalar chains (a hot chain stays cached
#: however many cold one-off chains come and go)
_BUILT_CHAIN_CACHE = IdLRUCache(maxsize=64)
