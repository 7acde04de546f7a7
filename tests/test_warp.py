"""Differential tests: warp ops vs PIL ground truth."""

import math

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from imagetransformations_tpu import ops
from imagetransformations_tpu.oracle import warp as ow


@pytest.mark.parametrize("angle", [-22.5, -10.0, 2.5, 17.5, 22.5, 45.0, 90.0])
def test_rotation_vs_pil(rgb_image, angle):
    ref = np.asarray(Image.fromarray(rgb_image).rotate(-angle, fillcolor=(0, 0, 0)))
    # oracle: exact up to ULP-degenerate boundary pixels (PIL's C loop uses
    # FMA-contracted incremental coords; see oracle/warp.py docstring)
    assert (ow.apply_rotation(rgb_image, angle) != ref).mean() <= 0.005
    # TPU path: f32 coords may flip floor at exact boundaries -> allow tiny frac
    out = np.asarray(ops.apply_rotation(jnp.asarray(rgb_image), angle))
    mismatch = (out != ref).mean()
    assert mismatch <= 0.005, f"nearest-pixel mismatch fraction {mismatch}"


@pytest.mark.parametrize("tx,ty", [(5, 5), (-7, 3), (0, 0), (-50, -50), (60, 10)])
def test_translation_exact(rgb_image, tx, ty):
    ref = ow.apply_translation(rgb_image, tx, ty)
    # cross-check oracle against actual PIL crop+paste
    h, w = rgb_image.shape[:2]
    canvas = Image.new("RGB", (w, h), (0, 0, 0))
    cl, ct = max(0, -tx), max(0, -ty)
    cr, cb = min(w, w - tx), min(h, h - ty)
    if cl < cr and ct < cb:
        canvas.paste(Image.fromarray(rgb_image).crop((cl, ct, cr, cb)), (max(0, tx), max(0, ty)))
    np.testing.assert_array_equal(ref, np.asarray(canvas))
    out = np.asarray(ops.apply_translation(jnp.asarray(rgb_image), tx, ty))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("s", [0.1, 0.4, 0.7, 1.0])
def test_shear_vs_pil(rgb_image, s):
    h, w = rgb_image.shape[:2]
    shift = int(math.ceil(s * h))
    ref = np.asarray(
        Image.fromarray(rgb_image).transform(
            (w + shift, h),
            Image.AFFINE,
            (1, s, -shift if s > 0 else 0, 0, 1, 0),
            resample=Image.BICUBIC,
            fillcolor=(255, 255, 255),
        )
    )
    np.testing.assert_array_equal(ow.apply_shear(rgb_image, s), ref)
    out = np.asarray(ops.apply_shear(jnp.asarray(rgb_image), s))
    d = np.abs(out.astype(int) - ref.astype(int))
    assert (d > 1).mean() <= 0.002 and d.max() <= 255  # f32 trunc boundaries
    assert (d > 0).mean() <= 0.02


@pytest.mark.parametrize("sf", [0.9, 1.0, 1.1, 1.4, 0.5])
def test_scale_vs_pil(rgb_image, sf):
    h, w = rgb_image.shape[:2]
    nw, nh = int(w * sf), int(h * sf)
    scaled = Image.fromarray(rgb_image).resize((nw, nh), Image.Resampling.LANCZOS)
    if sf > 1.0:
        left, top = (nw - w) // 2, (nh - h) // 2
        ref = np.asarray(scaled.crop((left, top, left + w, top + h)))
    elif sf < 1.0:
        canvas = Image.new("RGB", (w, h), (0, 0, 0))
        canvas.paste(scaled, ((w - nw) // 2, (h - nh) // 2))
        ref = np.asarray(canvas)
    else:
        ref = np.asarray(scaled)
    np.testing.assert_array_equal(ow.apply_scale(rgb_image, sf), ref)  # oracle bit-exact
    out = np.asarray(ops.apply_scale(jnp.asarray(rgb_image), sf))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1  # <=1 LSB gate


def test_rotation_batched_angles(rgb_batch):
    angles = np.array([-20.0, 0.0, 10.0, 22.5], np.float32)
    out = np.asarray(ops.apply_rotation(jnp.asarray(rgb_batch), jnp.asarray(angles)))
    for i, a in enumerate(angles):
        ref = np.asarray(Image.fromarray(rgb_batch[i]).rotate(-float(a), fillcolor=(0, 0, 0)))
        assert (out[i] != ref).mean() <= 0.005


def test_flip_and_crop(rgb_image):
    x = jnp.asarray(rgb_image)
    np.testing.assert_array_equal(np.asarray(ops.flip_vertical(x)), rgb_image[::-1])
    c = np.asarray(ops.center_crop(x, 16, 16))
    assert c.shape == (16, 16, 3)


def test_zoom_identity(rgb_image):
    out = np.asarray(ops.random_zoom(jnp.asarray(rgb_image), 1.0))
    np.testing.assert_array_equal(out, rgb_image)


def test_affine_compose_matches_sequential(rgb_batch):
    """Fused single-gather warp == two sequential warps (f32 tolerance)."""
    from imagetransformations_tpu.ops.warp import (
        affine_warp,
        compose_matrices,
        rotation_matrix,
        translation_matrix,
    )

    x = jnp.asarray(rgb_batch, jnp.float32)
    h, w = x.shape[1], x.shape[2]
    m_rot = rotation_matrix(np.float32(15.0), w, h)
    m_tr = translation_matrix(np.float32(3.0), np.float32(-2.0))
    seq = affine_warp(affine_warp(x, m_rot), m_tr)
    fused = affine_warp(x, compose_matrices(m_tr, m_rot))
    # warp-of-warp resamples twice; fused resamples once -> compare on the
    # interior where a single bilinear step is exact for both (pure translate)
    m_tr2 = translation_matrix(np.float32(4.0), np.float32(6.0))
    m_tr3 = translation_matrix(np.float32(-1.0), np.float32(2.0))
    seq_t = affine_warp(affine_warp(x, m_tr2), m_tr3)
    fused_t = affine_warp(x, compose_matrices(m_tr3, m_tr2))
    # border fill differs by construction (sequential fills zeros that the
    # fused warp can still source) -> compare the common interior only
    a, b = np.asarray(seq_t), np.asarray(fused_t)
    np.testing.assert_allclose(a[:, 10:-10, 10:-10], b[:, 10:-10, 10:-10], atol=1e-3)
    assert fused.shape == seq.shape


class TestPerspectivePoints:
    """perspective_coeffs / apply_perspective (torchvision F.perspective API,
    fall_2025/transformations_code:54-67)."""

    def test_identity_points_identity_coeffs(self):
        from imagetransformations_tpu.ops.warp import perspective_coeffs

        pts = [(0, 0), (31, 0), (31, 31), (0, 31)]
        c = perspective_coeffs(pts, pts)
        np.testing.assert_allclose(c, [1, 0, 0, 0, 1, 0, 0, 0], atol=1e-6)

    def test_coeffs_map_endpoints_to_startpoints(self, rng):
        from imagetransformations_tpu.ops.warp import perspective_coeffs

        sp = [(0.0, 0.0), (31.0, 0.0), (31.0, 31.0), (0.0, 31.0)]
        ep = [(2.0, 1.0), (29.0, 3.0), (30.0, 28.0), (1.0, 30.0)]
        a, b, c, d, e, f, g, h = perspective_coeffs(sp, ep).astype(np.float64)
        for (sx, sy), (ex, ey) in zip(sp, ep):
            den = g * ex + h * ey + 1.0
            np.testing.assert_allclose((a * ex + b * ey + c) / den, sx, atol=1e-4)
            np.testing.assert_allclose((d * ex + e * ey + f) / den, sy, atol=1e-4)

    def test_apply_perspective_identity(self, rgb_image):
        from imagetransformations_tpu.ops.warp import apply_perspective

        h, w = rgb_image.shape[:2]
        pts = [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)]
        out = np.asarray(apply_perspective(jnp.asarray(rgb_image), pts, pts))
        # identity homography -> bilinear resample at exact centers == input
        assert np.array_equal(out, rgb_image)

    def test_apply_perspective_shift_matches_translation(self, rgb_image):
        from imagetransformations_tpu.ops.warp import apply_perspective

        h, w = rgb_image.shape[:2]
        sp = [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)]
        ep = [(3, 0), (w + 2, 0), (w + 2, h - 1), (3, h - 1)]  # shift right 3
        out = np.asarray(apply_perspective(jnp.asarray(rgb_image), sp, ep))
        assert np.array_equal(out[:, 3:w], rgb_image[:, 0 : w - 3])


def test_apply_scale_batched_bit_exact_per_image(rng):
    """Traced per-image factors: one resize per image, bit-exact vs the
    static apply_scale for every grid value (VERDICT r2 item 3)."""
    grid = (0.9, 1.0, 1.1, 1.2, 1.3, 1.4)
    imgs = rng.integers(0, 256, (len(grid), 32, 32, 3), dtype=np.uint8)
    vals = np.asarray(grid, np.float32)
    out = np.asarray(
        ops.apply_scale_batched(jnp.asarray(imgs), jnp.asarray(vals), grid)
    )
    for i, v in enumerate(grid):
        ref = np.asarray(ops.apply_scale(jnp.asarray(imgs[i]), float(v)))
        np.testing.assert_array_equal(out[i], ref)


def test_apply_scale_batched_all_formulations_bit_exact(rng, monkeypatch):
    """The scan-over-images formulation (fast XLA compile, default), the
    batched limb-f32-MXU one, and the int32-einsum one must ALL be
    bit-exact vs apply_scale. Distinct batch sizes force a fresh trace per
    formulation (op_jit is plain jax.jit — a same-signature call would
    reuse another formulation's executable). The grid must be
    f32-roundtripped so the matrices and the per-image reference calls
    agree on int(size*factor) truncation (see the nonsquare test below)."""
    import imagetransformations_tpu.ops.warp as wp

    grid = tuple(float(np.float32(v)) for v in (0.9, 1.0, 1.2, 1.4))
    for form, n in (("scan", 4), ("limb", 3), ("i32", 2)):
        monkeypatch.setattr(wp, "_SCALE_FORM", form)
        monkeypatch.setattr(wp, "_SCALE_LIMB_MXU", form != "i32")
        imgs = rng.integers(0, 256, (n, 40, 48, 3), dtype=np.uint8)
        vals = rng.choice(np.asarray(grid, np.float32), n)
        out = np.asarray(
            wp.apply_scale_batched(jnp.asarray(imgs), jnp.asarray(vals), grid)
        )
        for i, v in enumerate(vals):
            ref = np.asarray(wp.apply_scale(jnp.asarray(imgs[i]), float(v)))
            np.testing.assert_array_equal(out[i], ref, err_msg=f"form={form}")


def test_apply_scale_batched_nonsquare(rng):
    """The resized size int(w*f) is truncation-sensitive: the grid's float
    repr must be used for BOTH the batched matrices and the reference call
    (f32(0.9)*40 = 35.999..., float64 0.9*40 = 36.000...). apply_all passes
    f32-consistent grids+values, mirrored here."""
    grid = tuple(float(np.float32(v)) for v in (0.9, 1.2))
    imgs = rng.integers(0, 256, (2, 24, 40, 3), dtype=np.uint8)
    vals = np.asarray([grid[1], grid[0]], np.float32)
    out = np.asarray(
        ops.apply_scale_batched(jnp.asarray(imgs), jnp.asarray(vals), grid)
    )
    for i, v in enumerate(vals):
        ref = np.asarray(ops.apply_scale(jnp.asarray(imgs[i]), float(v)))
        np.testing.assert_array_equal(out[i], ref)


def test_translation_truncates_toward_zero(rng):
    """Reference uses int(tx) (trunc toward zero), not floor: -3.7 -> -3
    (transformation.py:288-289). ADVICE r2 item 4."""
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = np.asarray(ops.apply_translation(jnp.asarray(img), -3.7, 2.9))
    ref = ow.apply_translation(img, -3, 2)
    np.testing.assert_array_equal(out, ref)
    # warp path (traced shifts) must agree
    out_w = np.asarray(
        ops.apply_translation(
            jnp.asarray(img), jnp.float32(-3.7), jnp.float32(2.9)
        )
    )
    np.testing.assert_array_equal(out_w, ref)


def test_rotation_tracer_angle_without_bound_stays_exact(rng):
    """An angle that is a tracer inside an enclosing jit must NOT route to
    the roll/select kernel unless the caller declares max_angle_deg — a
    >45-degree angle through the kernel would emit garbage (ADVICE r2 #1)."""
    img = rng.integers(0, 256, (1, 24, 24, 3), dtype=np.uint8)

    @jax.jit
    def rot(x, a):
        return ops.apply_rotation(x, a)

    out = np.asarray(rot(jnp.asarray(img), jnp.float32(135.0)))
    ref = np.asarray(ops.apply_rotation(jnp.asarray(img), 135.0))
    np.testing.assert_array_equal(out, ref)

    # with a declared bound, the kernel path engages and matches PIL
    @jax.jit
    def rot_b(x, a):
        return ops.apply_rotation(x, a, max_angle_deg=25.0)

    out_b = np.asarray(rot_b(jnp.asarray(img), jnp.asarray([15.0], jnp.float32)))
    ref_b = np.asarray(
        Image.fromarray(img[0]).rotate(-15.0, fillcolor=(0, 0, 0))
    )
    assert (out_b[0] != ref_b).mean() <= 0.005


def test_random_zoom_extreme_factor_falls_back_to_warp(rng):
    """Factors outside the kernel's sane range (< 0.5 or > 4) must use the
    exact warp, not unroll thousands of chained rolls (ADVICE r2 #3)."""
    img = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    x = jnp.asarray(img)
    from imagetransformations_tpu.ops.warp import affine_warp, zoom_matrix

    for f in (0.1, 8.0):
        out = np.asarray(ops.random_zoom(x, f))
        ref = np.asarray(affine_warp(x, zoom_matrix(f, 32, 32), method="bilinear", fill=0.0))
        np.testing.assert_array_equal(out, ref)
