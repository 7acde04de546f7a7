"""Differential tests for the whole-pipeline mega-kernel
(ops/pallas/megakernel.py) vs the CPU oracles.

The kernel runs in interpret mode on the CPU backend; results must match
gaussian_blur -> rotate_3shear -> grayscale bit-for-bit, except for the
known XLA-CPU FMA contraction on blur's 0.5-rint boundaries (<=1 LSB at a
vanishing fraction of pixels; the TPU VPU rounds separately and matches
exactly — see CLAUDE.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from imagetransformations_tpu.oracle import elementwise as oe
from imagetransformations_tpu.oracle import fast_warp as ofw
from imagetransformations_tpu.oracle import stencil as ost
from imagetransformations_tpu.ops.pallas.megakernel import fused_blur_rotate_image
from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn


def _oracle(imgs, radius, angle, gray):
    out = (
        np.stack([ost.gaussian_blur(im, radius) for im in imgs])
        if radius
        else imgs
    )
    if angle:
        out = ofw.rotate_3shear(out, angle)
    if gray:
        out = np.stack([oe.grayscale_rgb(im) for im in out])
    return out


@pytest.mark.parametrize(
    "shape,radius,angle,gray",
    [
        ((2, 64, 48), 1.5, 15.0, True),
        ((2, 64, 48), 1.5, 15.0, False),
        ((1, 96, 64), 0.0, -22.5, True),
        ((2, 224, 224), 2.5, 7.0, True),   # ImageNet shape: no alignment gate
        ((3, 32, 32), 1.0, 22.5, False),   # CIFAR shape (wc < 128 lanes)
        ((1, 64, 64), 1.0, 0.0, True),     # identity-rotation short-circuit
    ],
)
def test_megakernel_matches_oracle(rng, shape, radius, angle, gray):
    n, h, w = shape
    imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    out = np.asarray(
        fused_blur_rotate_image(
            jnp.asarray(imgs), radius, angle, grayscale_out=gray
        )
    )
    ref = _oracle(imgs, radius, angle, gray)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert (err > 0).mean() <= 0.001  # FMA-contraction flips only


@pytest.mark.parametrize(
    "shape,radius,angle,gray",
    [
        ((2, 64, 48), 1.5, 15.0, True),
        ((2, 64, 48), 1.5, 15.0, False),
        ((1, 96, 64), 0.0, -22.5, False),
        ((3, 32, 32), 1.0, 22.5, True),
        ((1, 64, 64), 1.0, 0.0, True),
        ((1, 64, 64), 1.0, 0.0, False),
    ],
)
def test_megakernel_stream_matches_f32_oracle(rng, shape, radius, angle, gray):
    """stream=True: f32 composition with one final quantization, bit-equal
    to fast_warp.fused_stream_chain (numpy f32 mirrors every kernel op)."""
    n, h, w = shape
    imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    out = np.asarray(
        fused_blur_rotate_image(
            jnp.asarray(imgs), radius, angle, grayscale_out=gray, stream=True
        )
    )
    ref = ofw.fused_stream_chain(imgs, radius, angle, grayscale_out=gray)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert (err > 0).mean() <= 0.001  # XLA-CPU FMA-contraction flips only


def test_stream_mode_stays_close_to_per_op_chain(rng):
    """The f32-streaming output differs from the per-op-quantized chain
    only by the accumulated truncation rounding: each of the 3 per-pass
    truncs biases DOWN by ~0.5 LSB, so stream sits ~+1.5 LSB above with a
    hard bound of 3."""
    imgs = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    a = np.asarray(
        fused_blur_rotate_image(jnp.asarray(imgs), 1.5, 15.0, grayscale_out=True, stream=True)
    )
    b = np.asarray(
        fused_blur_rotate_image(jnp.asarray(imgs), 1.5, 15.0, grayscale_out=True)
    )
    d = a.astype(int) - b.astype(int)
    assert np.abs(d).max() <= 3
    assert 0.0 <= d.mean() <= 2.5  # stream removes the downward trunc bias


def test_chain_routes_blur_rotation_gray_to_megakernel(rng):
    """build_chain_fn's fast path fuses the benchmark pipeline through the
    STREAM megakernel (f32 intermediates, one final quantization — the
    chain's documented fast-mode contract) on arbitrary shapes."""
    imgs = rng.integers(0, 256, (2, 72, 56, 3), dtype=np.uint8)
    chain = [
        OpSpec("blur", {"radius": 1.5}),
        OpSpec("rotation", {"angle": 15.0}),
        OpSpec("grayscale"),
    ]
    out = np.asarray(build_chain_fn(chain)(jnp.asarray(imgs)))
    ref = ofw.fused_stream_chain(imgs, 1.5, 15.0, grayscale_out=True)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert (err > 0).mean() <= 0.001


def test_chain_rotation_only_megakernel(rng):
    imgs = rng.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(
        build_chain_fn([OpSpec("rotation", {"angle": -10.0})])(jnp.asarray(imgs))
    )
    ref = ofw.fused_stream_chain(imgs, 0.0, -10.0, grayscale_out=False)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1 and (err > 0).mean() <= 0.001


def test_chain_single_affine_ops_match_dedicated_paths(rng):
    """Single-op affine chain stages route to dedicated implementations
    (flip -> jnp.flip, static translation -> canvas copy, static zoom ->
    the gather-free kernel); results must match the op semantics."""
    from imagetransformations_tpu.ops import warp as wp

    imgs = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    x = jnp.asarray(imgs)
    out = np.asarray(build_chain_fn([OpSpec("flip_vertical")])(x))
    np.testing.assert_array_equal(out, imgs[:, ::-1])

    out = np.asarray(build_chain_fn([OpSpec("translation", {"tx": 7})])(x))
    ref = np.asarray(wp.apply_translation(x, 7, 7))
    np.testing.assert_array_equal(out, ref)

    out = np.asarray(build_chain_fn([OpSpec("zoom", {"factor": 1.2})])(x))
    ref = np.asarray(wp.random_zoom(x, 1.2))
    np.testing.assert_array_equal(out, ref)


def test_chain_multi_affine_run_still_fuses(rng):
    """translation+zoom runs collapse into ONE resampling (the
    affine-matrix composition path) AND apply in chain order: the fused
    warp must match sequential matrix warps of the same ops (regression
    for the reversed compose_matrices argument order, which produced the
    zoom-then-translate image — 99.5% of pixels wrong)."""
    from imagetransformations_tpu.ops import warp as wp

    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    chain = [OpSpec("translation", {"tx": 6}), OpSpec("zoom", {"factor": 1.3})]
    out = np.asarray(build_chain_fn(chain)(jnp.asarray(imgs)))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # sequential application with the SAME warp primitive (two gathers):
    # fused = one gather of the composed matrix; interior pixels must agree
    # except resample-boundary rounding
    h, w = 64, 64
    x = jnp.asarray(imgs)
    step1 = wp.affine_warp(x, wp.translation_matrix(6.0, 6.0), method="bilinear", fill=0.0)  # chain ty defaults to tx
    step2 = wp.affine_warp(step1, wp.zoom_matrix(1.3, w, h), method="bilinear", fill=0.0)
    seq = np.asarray(step2)
    diff = np.abs(out.astype(int) - seq.astype(int))
    # double-resampled reference blurs slightly vs the single fused gather;
    # demand agreement in distribution, not bitwise: most pixels close
    assert float((diff <= 8).mean()) > 0.9, float((diff <= 8).mean())


def test_unaligned_u8_relayout_flags_parity(rng):
    """The gated relayout micro-opts (_UNALIGNED_LUMA_U8 sublane-padded u8
    front, _U8_OUTPUT_STORE cast-before-transpose store) are bit-identical
    to the default routes — only Mosaic acceptance needs the real chip
    (tools/probe_unaligned_luma.py), not semantics."""
    from imagetransformations_tpu.ops.pallas import megakernel as mk

    imgs = rng.integers(0, 256, (2, 56, 40, 3), dtype=np.uint8)  # unaligned
    base = np.asarray(
        fused_blur_rotate_image(
            jnp.asarray(imgs), 1.5, 15.0, grayscale_out=True, stream=True
        )
    )
    angles = jnp.asarray([15.0, -9.0], jnp.float32)
    base_traced = np.asarray(
        mk.fused_blur_rotate_batched(
            jnp.asarray(imgs), 1.5, angles, grayscale_out=True, stream=True
        )
    )
    old = mk._UNALIGNED_LUMA_U8, mk._U8_OUTPUT_STORE
    try:
        # flip both flags relative to the module defaults — parity must
        # hold whichever way the defaults land after hardware validation
        mk._UNALIGNED_LUMA_U8 = not old[0]
        mk._U8_OUTPUT_STORE = not old[1]
        # the jit caches key on static args only — clear so the flags
        # re-trace the kernel bodies
        fused_blur_rotate_image.clear_cache()
        mk._fused_blur_rotate_batched_jit.clear_cache()
        out = np.asarray(
            fused_blur_rotate_image(
                jnp.asarray(imgs), 1.5, 15.0, grayscale_out=True, stream=True
            )
        )
        # the TRACED gray1 kernel shares _luma_blur_front and the output
        # store — cover it under the flipped flags too
        out_traced = np.asarray(
            mk.fused_blur_rotate_batched(
                jnp.asarray(imgs), 1.5, angles, grayscale_out=True, stream=True
            )
        )
    finally:
        mk._UNALIGNED_LUMA_U8, mk._U8_OUTPUT_STORE = old
        fused_blur_rotate_image.clear_cache()
        mk._fused_blur_rotate_batched_jit.clear_cache()
    np.testing.assert_array_equal(out, base)
    np.testing.assert_array_equal(out_traced, base_traced)


def test_traced_angle_megakernel_matches_static(rng):
    """fused_blur_rotate_batched (per-image log-routed shifts) must match
    the static-angle kernel per image (device f32 shift computation can
    flip floor() at exact boundaries -> <=1 LSB through the continuous
    bilinear chain)."""
    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    imgs = rng.integers(0, 256, (3, 64, 48, 3), dtype=np.uint8)
    angles = np.asarray([-15.0, 0.0, 22.4], np.float32)
    for stream in (True, False):
        out = np.asarray(
            fused_blur_rotate_batched(
                jnp.asarray(imgs), 1.5, jnp.asarray(angles),
                grayscale_out=True, stream=stream,
            )
        )
        for i, a in enumerate(angles):
            ref = np.asarray(
                fused_blur_rotate_image(
                    jnp.asarray(imgs[i : i + 1]), 1.5, float(a),
                    grayscale_out=True, stream=stream,
                )
            )
            err = np.abs(out[i : i + 1].astype(int) - ref.astype(int))
            assert err.max() <= 1, (stream, a, err.max())


def test_traced_grouped_routing_ragged_and_budget_edge(rng):
    """Grouped traced routing (_shear_pass_traced_grouped): row counts NOT
    divisible by the group height leave a ragged tail group, and the exact
    budget angle (22.5) drives the largest coarse shifts + residuals — both
    must stay <=1 LSB vs the stream oracle. Also pins the ungrouped
    fallback (_TRACED_GROUP_ROWS=-1; 0 means AUTO since the one-sided
    grouped-routing change) to identical outputs."""
    from imagetransformations_tpu.ops.pallas import megakernel as mk

    imgs = rng.integers(0, 256, (2, 40, 56, 3), dtype=np.uint8)
    angles = np.asarray([22.5, -22.5], np.float32)
    out = np.asarray(
        mk.fused_blur_rotate_batched(
            jnp.asarray(imgs), 1.5, jnp.asarray(angles),
            grayscale_out=True, stream=True,
        )
    )
    for i, a in enumerate(angles):
        ref = ofw.fused_stream_chain(
            imgs[i : i + 1], 1.5, float(a), grayscale_out=True
        )
        err = np.abs(out[i : i + 1].astype(int) - ref.astype(int))
        assert err.max() <= 1, (a, err.max())

    # the non-gray kernel groups pass 2 at PIXEL granularity (gh*c
    # interleaved rows per group) — cover it on the same ragged shape
    out_ng = np.asarray(
        mk.fused_blur_rotate_batched(
            jnp.asarray(imgs), 1.5, jnp.asarray(angles),
            grayscale_out=False, stream=True,
        )
    )
    for i, a in enumerate(angles):
        ref = ofw.fused_stream_chain(imgs[i : i + 1], 1.5, float(a))
        err = np.abs(out_ng[i : i + 1].astype(int) - ref.astype(int))
        assert err.max() <= 1, ("nongray", a, err.max())

    old = mk._TRACED_GROUP_ROWS
    old2 = mk._TRACED_GROUP_ROWS2
    # -1 disables grouping on BOTH passes (0 selects the auto group height
    # since round 5, which would compare the grouped config to itself)
    mk._TRACED_GROUP_ROWS = -1
    mk._TRACED_GROUP_ROWS2 = -1
    try:
        mk._fused_blur_rotate_batched_jit.clear_cache()
        ungrouped = np.asarray(
            mk.fused_blur_rotate_batched(
                jnp.asarray(imgs), 1.5, jnp.asarray(angles),
                grayscale_out=True, stream=True,
            )
        )
        ungrouped_ng = np.asarray(
            mk.fused_blur_rotate_batched(
                jnp.asarray(imgs), 1.5, jnp.asarray(angles),
                grayscale_out=False, stream=True,
            )
        )
    finally:
        mk._TRACED_GROUP_ROWS = old
        mk._TRACED_GROUP_ROWS2 = old2
        mk._fused_blur_rotate_batched_jit.clear_cache()
    np.testing.assert_array_equal(out, ungrouped)
    np.testing.assert_array_equal(out_ng, ungrouped_ng)


def test_traced_stream_nongray_zero_angle_uses_rint(rng):
    """Per-image quantization semantics in the traced STREAM non-gray
    kernel: an angle-0 image in the batch streams blur-only and must
    quantize with rint like the static kernel / oracle (fast_warp.py:160)
    — not the post-shear trunc (which floors ~half the blurred pixels 1 LSB
    low and previously went undetected because the only traced-vs-static
    test used grayscale_out=True)."""
    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    imgs = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    angles = np.asarray([0.0, 12.0], np.float32)
    out = np.asarray(
        fused_blur_rotate_batched(
            jnp.asarray(imgs), 1.5, jnp.asarray(angles),
            grayscale_out=False, stream=True,
        )
    )
    for i, a in enumerate(angles):
        ref = ofw.fused_stream_chain(imgs[i : i + 1], 1.5, float(a))
        diff = out[i : i + 1].astype(int) - ref.astype(int)
        assert np.abs(diff).max() <= 1, (a, np.abs(diff).max())
        # trunc-instead-of-rint flips ~50% of pixels; f32 boundary noise
        # flips a few per mille at most
        assert (diff != 0).mean() < 0.05, (a, (diff != 0).mean())


def test_gray1_megakernel_nonzero_fill_margin_exact(rng):
    """The gray1 kernels fold the shear fill margin in BEFORE the vertical
    blur pass; the margin must still equal EXACT fill afterwards (fill *
    sum(f32 taps) != fill — regression for the pre-blur margin fold), so
    the fill=255 stream chain stays within the standard gate vs the
    oracle, which pads shears with exact fill after the blur."""
    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_image,
    )

    imgs = rng.integers(0, 256, (1, 64, 48, 3), dtype=np.uint8)
    out = np.asarray(
        fused_blur_rotate_image(
            jnp.asarray(imgs), 1.5, 15.0, fill=255,
            grayscale_out=True, stream=True,
        )
    )
    ref = ofw.fused_stream_chain(imgs, 1.5, 15.0, grayscale_out=True, fill=255)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1 and (err > 0).mean() <= 0.001, (
        err.max(), (err > 0).mean()
    )


def test_fast_compile_chain_matches_stream_oracle(rng):
    """build_chain_fn(fast_compile=True) runs a pure fused-stage chain as
    a host-side call into the traced kernel's own jit — output must match
    the stream oracle within the traced-kernel budget (device f32 shifts:
    <=1 LSB at floor boundaries), and the EXECUTABLE must actually be
    shared across angles within one routing budget (the whole point)."""
    from imagetransformations_tpu.ops.pallas import megakernel as mk

    imgs = rng.integers(0, 256, (2, 72, 56, 3), dtype=np.uint8)
    chain = [
        OpSpec("blur", {"radius": 1.5}),
        OpSpec("rotation", {"angle": 15.0}),
        OpSpec("grayscale"),
    ]
    out = np.asarray(
        build_chain_fn(chain, fast_compile=True)(jnp.asarray(imgs))
    )
    ref = ofw.fused_stream_chain(imgs, 1.5, 15.0, grayscale_out=True)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert (err > 0).mean() <= 0.001

    # sharing: two different angles in the SAME 5-degree budget add at most
    # one new entry to the traced kernel's jit cache (the angle rides in as
    # a runtime operand, not a baked constant)
    mk._fused_blur_rotate_batched_jit.clear_cache()
    for a in (7.0, 9.0):
        build_chain_fn(
            [
                OpSpec("blur", {"radius": 1.5}),
                OpSpec("rotation", {"angle": a}),
                OpSpec("grayscale"),
            ],
            fast_compile=True,
        )(jnp.asarray(imgs))
    assert mk._fused_blur_rotate_batched_jit._cache_size() == 1

    # angle 0 (blur-only short-circuit) keeps the static kernel: identical
    # to the default build
    chain0 = [OpSpec("blur", {"radius": 1.5}), OpSpec("grayscale")]
    a = np.asarray(build_chain_fn(chain0, fast_compile=True)(jnp.asarray(imgs)))
    b = np.asarray(build_chain_fn(chain0)(jnp.asarray(imgs)))
    np.testing.assert_array_equal(a, b)

    # a chain with surrounding ops falls back to the normal fused build
    chain_x = [
        OpSpec("brightness", {"factor": 0.1}),
        OpSpec("blur", {"radius": 1.5}),
        OpSpec("rotation", {"angle": 15.0}),
    ]
    fx = np.asarray(build_chain_fn(chain_x, fast_compile=True)(jnp.asarray(imgs)))
    fy = np.asarray(build_chain_fn(chain_x)(jnp.asarray(imgs)))
    np.testing.assert_array_equal(fx, fy)


def test_traced_megakernel_budget_edges(rng):
    """The static routing budget's documented edge behavior: concrete
    angles beyond max_angle_deg raise ValueError; the exact budget angle
    works; TRACER angles (uninspectable) are clamped to the budget instead
    of emitting unmatched-select garbage (ADVICE r2 failure mode)."""
    import jax

    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    imgs = rng.integers(0, 256, (1, 48, 40, 3), dtype=np.uint8)
    x = jnp.asarray(imgs)

    with pytest.raises(ValueError, match="routing budget"):
        fused_blur_rotate_batched(x, 1.0, jnp.asarray([30.0], jnp.float32))

    # exactly at the budget: runs and matches the stream oracle
    at = np.asarray(
        fused_blur_rotate_batched(
            x, 1.0, jnp.asarray([22.5], jnp.float32), stream=True
        )
    )
    ref = ofw.fused_stream_chain(imgs, 1.0, 22.5, grayscale_out=False)
    assert np.abs(at.astype(int) - ref.astype(int)).max() <= 1

    # tracer angles from an enclosing jit skip the host check and clamp
    clamped = np.asarray(
        jax.jit(
            lambda v, a: fused_blur_rotate_batched(v, 1.0, a, stream=True)
        )(x, jnp.asarray([30.0], jnp.float32))
    )
    assert np.abs(clamped.astype(int) - ref.astype(int)).max() <= 1


def test_chain_routes_traced_angles_to_fused_megakernel(rng):
    """blur -> per-image-angle rotation -> grayscale fuses into the traced
    megakernel (one HBM read + write) and matches the stream oracle."""
    imgs = rng.integers(0, 256, (2, 48, 40, 3), dtype=np.uint8)
    angles = np.asarray([9.0, -21.0], np.float32)
    chain = [
        OpSpec("blur", {"radius": 1.5}),
        OpSpec("rotation", {"angle": jnp.asarray(angles)}),
        OpSpec("grayscale"),
    ]
    out = np.asarray(build_chain_fn(chain)(jnp.asarray(imgs)))
    for i, a in enumerate(angles):
        ref = ofw.fused_stream_chain(
            imgs[i : i + 1], 1.5, float(a), grayscale_out=True
        )
        err = np.abs(out[i : i + 1].astype(int) - ref.astype(int))
        assert err.max() <= 1, (a, err.max())


def test_fast_compile_spec_subset_of_match_mega(rng):
    """_fast_compile_spec must stay a strict subset of _match_mega's
    static-angle matching: any chain it accepts would otherwise run the
    static megakernel, so the two matchers drifting apart silently changes
    which kernel (and which parity budget) a chain gets."""
    from imagetransformations_tpu.pipeline.chain import (
        _fast_compile_spec,
        _match_mega,
    )

    x = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    chains = [
        [OpSpec("blur", {"radius": 1.5}), OpSpec("rotation", {"angle": 15.0}),
         OpSpec("grayscale")],
        [OpSpec("blur", {"radius": 2.0}), OpSpec("rotation", {"angle": -7.5})],
        [OpSpec("rotation", {"angle": 44.9}), OpSpec("grayscale")],
        [OpSpec("rotation", {"angle": 3.0})],
        # non-matching shapes: angle 0 / >45 / trailing op / leading op
        [OpSpec("blur", {"radius": 1.5}), OpSpec("rotation", {"angle": 0.0})],
        [OpSpec("rotation", {"angle": 46.0})],
        [OpSpec("blur", {"radius": 1.5}), OpSpec("rotation", {"angle": 5.0}),
         OpSpec("grayscale"), OpSpec("brightness", {"factor": 0.1})],
        [OpSpec("brightness", {"factor": 0.1}),
         OpSpec("rotation", {"angle": 5.0})],
        [OpSpec("blur", {"radius": 1.5})],
        [OpSpec("grayscale")],
    ]
    for chain in chains:
        fc = _fast_compile_spec(chain)
        if fc is None:
            continue
        radius_fc, angle_fc, gray_fc = fc
        mm = _match_mega(chain, 0, False, x)
        assert mm is not None, chain
        radius, angle, gray, consumed, bound = mm
        assert consumed == len(chain), chain  # whole-chain match only
        assert bound is None, chain  # static angle => no routing bound
        assert (radius, angle, gray) == (radius_fc, angle_fc, gray_fc), chain


@pytest.mark.parametrize(
    "shape,radius,angle,fill",
    [
        ((8, 224, 224), 1.5, 15.0, 0),    # 224-class: (4,1), i32perimg front
        ((8, 224, 224), 0.0, -9.3, 0),    # no blur
        ((8, 224, 224), 1.0, 22.5, 3),    # nonzero fill: margin restore+scrubs
        ((64, 32, 32), 1.5, 15.0, 0),     # CIFAR-class: (8,8), u8packed front
        ((256, 32, 32), 1.5, 15.0, 2),    # (16,16): sub-128 csz=40 strides
        ((32, 64, 64), 2.0, 30.0, 0),     # (8,4)
        ((8, 160, 192), 2.0, 11.0, 0),    # ragged 224-class
    ],
)
def test_packed_gray1_matches_oracle_and_unpacked(rng, shape, radius, angle, fill):
    """The multi-image-packed gray1 kernel (_mega_gray1_packed_kernel) is
    bit-identical per image to the single-image kernel and the stream
    oracle: compartment-cyclic roll wraps reproduce the single-image pad
    semantics exactly (probe-validated 0 LSB on the real chip; on XLA CPU
    the known FMA-contraction artifact flips <=1 LSB on ~1e-5 of pixels).

    h >= 128 shapes FORCE the packed path (production scopes packing to
    h < 128 — a perf wash at 224/512, tools/probe_packed_224.py — but the
    (4,1)/i32perimg-front kernel variant stays parity-covered here)."""
    import imagetransformations_tpu.ops.pallas.megakernel as mk

    n, h, w = shape
    orig = mk._pack_factors
    if h >= 128:
        mk._pack_factors = lambda nn, hh, ww: (4, 1)
        fused_blur_rotate_image.clear_cache()
    try:
        pkl, pks = mk._pack_factors(n, h, w)
        assert pkl * pks > 1 and n % (pkl * pks) == 0  # packed path engages
        imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out = np.asarray(
            fused_blur_rotate_image(
                jnp.asarray(imgs), radius, angle, fill=fill,
                grayscale_out=True, stream=True,
            )
        )
    finally:
        mk._pack_factors = orig
        fused_blur_rotate_image.clear_cache()
    ref = ofw.fused_stream_chain(
        imgs, radius, angle, fill=fill, grayscale_out=True
    )
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
    assert (err > 0).mean() <= 1e-4


def test_pack_factors_skip_odd_batches(rng):
    """A batch not divisible by the pack count must fall back to the
    single-image kernel and still match the oracle (32x32 packs 8x8=64;
    batch 3 is not divisible)."""
    imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    out = np.asarray(
        fused_blur_rotate_image(
            jnp.asarray(imgs), 1.5, 15.0, grayscale_out=True, stream=True
        )
    )
    ref = ofw.fused_stream_chain(imgs, 1.5, 15.0, grayscale_out=True)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 1
