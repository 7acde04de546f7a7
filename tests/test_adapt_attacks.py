"""Adaptation engines + attacks: functional behavior on a tiny linear model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


@pytest.fixture
def linear_model(rng):
    w = jnp.asarray(rng.standard_normal((48, 10)).astype(np.float32))

    def model_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    return model_fn


@pytest.fixture
def inputs(rng):
    return jnp.asarray(rng.random((16, 4, 4, 3)).astype(np.float32))


def test_fgsm_increases_loss(linear_model, inputs, rng):
    from imagetransformations_tpu.attacks import fgsm_attack

    labels = jnp.asarray(rng.integers(0, 10, 16))

    def loss(x):
        return float(
            optax.softmax_cross_entropy_with_integer_labels(
                linear_model(x), labels
            ).mean()
        )

    adv = fgsm_attack(linear_model, inputs, labels, eps=0.05)
    assert loss(adv) > loss(inputs)
    assert float(jnp.max(jnp.abs(adv - inputs))) <= 0.05 + 1e-6


def test_reverse_fgsm_decreases_loss(linear_model, inputs, rng):
    from imagetransformations_tpu.attacks import reverse_fgsm

    labels = jnp.asarray(rng.integers(0, 10, 16))

    def loss(x):
        return float(
            optax.softmax_cross_entropy_with_integer_labels(
                linear_model(x), labels
            ).mean()
        )

    fixed = reverse_fgsm(linear_model, inputs, labels, eps=0.05)
    assert loss(fixed) < loss(inputs)


def test_pgd_stays_in_ball(linear_model, inputs, rng):
    from imagetransformations_tpu.attacks import pgd_attack

    labels = jnp.asarray(rng.integers(0, 10, 16))
    adv = pgd_attack(
        linear_model, inputs, labels, jax.random.key(0), eps=0.03, steps=5
    )
    assert float(jnp.max(jnp.abs(adv - inputs))) <= 0.03 + 1e-6
    assert adv.min() >= 0.0 and adv.max() <= 1.0


def test_minimal_epsilon_monotone(linear_model, inputs, rng):
    from imagetransformations_tpu.attacks import minimal_epsilon

    labels = jnp.argmax(linear_model(inputs), axis=-1)  # currently correct
    eps = minimal_epsilon(linear_model, inputs, labels)
    assert eps.shape == (16,)
    assert (np.asarray(eps) > 0).all()


def test_refine_batch_raises_msp(linear_model, inputs):
    from imagetransformations_tpu.adapt.refine import refine_batch

    flagged = jnp.ones((16,), bool)
    x_ref, iters = refine_batch(
        linear_model, inputs, flagged, max_iters=10, eps=0.02, msp_stop=0.9
    )
    msp0 = jnp.max(jax.nn.softmax(linear_model(inputs), -1), -1)
    msp1 = jnp.max(jax.nn.softmax(linear_model(x_ref), -1), -1)
    assert float(jnp.mean(msp1)) > float(jnp.mean(msp0))
    # refinement must preserve the original predictions (reference refines
    # toward the model's own initial prediction)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(linear_model(x_ref), -1)),
        np.asarray(jnp.argmax(linear_model(inputs), -1)),
    )


def test_refine_respects_flag_mask(linear_model, inputs):
    from imagetransformations_tpu.adapt.refine import refine_batch

    flagged = jnp.zeros((16,), bool).at[0].set(True)
    x_ref, _ = refine_batch(linear_model, inputs, flagged, max_iters=3)
    np.testing.assert_allclose(np.asarray(x_ref[1:]), np.asarray(inputs[1:]))


def test_tent_reduces_entropy(rng):
    """TENT on a BN-style model: entropy after adaptation drops."""
    from imagetransformations_tpu.adapt.tent import (
        entropy_loss, init_tent, make_tent_step,
    )

    w = jnp.asarray(rng.standard_normal((48, 10)).astype(np.float32))
    params = {
        "bn_scale": jnp.ones((48,)),
        "bn_bias": jnp.zeros((48,)),
        "head": {"w": w},
    }

    def model_apply(p, x):
        f = x.reshape(x.shape[0], -1)
        f = f * p["bn_scale"] + p["bn_bias"]
        return f @ p["head"]["w"]

    state, tx = init_tent(params, lr=0.05)
    # only bn_* are trainable
    assert state.bn_params["head"] is None or all(
        v is None for v in jax.tree_util.tree_leaves(
            state.bn_params["head"], is_leaf=lambda x: x is None)
    )
    step = make_tent_step(model_apply, tx)
    x = jnp.asarray(rng.random((32, 4, 4, 3)).astype(np.float32))
    from imagetransformations_tpu.adapt.tent import merge_params

    e0 = float(entropy_loss(model_apply(params, x)))
    for _ in range(10):
        state, logits = step(state, x)
    merged = merge_params(state.bn_params, state.frozen_params)
    e1 = float(entropy_loss(model_apply(merged, x)))
    assert e1 < e0
    # frozen head untouched
    np.testing.assert_array_equal(np.asarray(merged["head"]["w"]), np.asarray(w))


def test_universal_patch_reduces_loss(linear_model, rng):
    from imagetransformations_tpu.adapt.patches import apply_patch, train_universal_patch

    x = jnp.asarray(rng.random((32, 8, 8, 3)).astype(np.float32))

    w = jnp.asarray(rng.standard_normal((192, 10)).astype(np.float32))

    def model_fn(xb):
        return xb.reshape(xb.shape[0], -1) @ w

    y = jnp.argmax(model_fn(x), -1)
    patch = train_universal_patch(
        model_fn, [x] * 20, [y] * 20, patch_hw=(3, 3), lr=0.05
    )
    ce = lambda xb: float(
        optax.softmax_cross_entropy_with_integer_labels(model_fn(xb), y).mean()
    )
    # training must beat the untrained (0.5-gray) patch at the same position
    init = jnp.zeros((3, 3, 3), jnp.float32) + 0.5
    assert ce(apply_patch(x, patch)) < ce(apply_patch(x, init))


def test_restorative_patches_reduce_entropy(rng):
    from imagetransformations_tpu.adapt.patches import restorative_patches_per_image

    w = jnp.asarray(rng.standard_normal((192, 10)).astype(np.float32))

    def model_fn(xb):
        return xb.reshape(xb.shape[0], -1) @ w

    x = jnp.asarray(rng.random((8, 8, 8, 3)).astype(np.float32))
    patched, patches = restorative_patches_per_image(
        model_fn, x, patch_hw=(3, 3), iters=15, lr=0.1
    )
    def ent(xb):
        logp = jax.nn.log_softmax(model_fn(xb), -1)
        return float(-jnp.mean(jnp.sum(jnp.exp(logp) * logp, -1)))

    assert ent(patched) < ent(x)


def test_augmix_output_valid(rng):
    from imagetransformations_tpu.adapt.augmix import augmix

    x = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    out = augmix(x, jax.random.key(0))
    assert out.shape == x.shape and out.dtype == jnp.uint8
    assert not np.array_equal(np.asarray(out), np.asarray(x))


def test_posthoc_temperature_improves_nll(rng):
    from imagetransformations_tpu.adapt.posthoc import TemperatureScaling
    from imagetransformations_tpu.uq.calibration import nll

    logits = jnp.asarray(rng.standard_normal((2000, 10)).astype(np.float32))
    labels = jax.random.categorical(jax.random.key(0), logits)
    overconfident = logits * 3.0
    ts = TemperatureScaling().fit(overconfident, labels)
    assert ts.temperature > 1.5
    before = float(nll(jax.nn.softmax(overconfident, -1), labels))
    after = float(nll(ts.calibrate(overconfident), labels))
    assert after < before


def test_isotonic_calibrations(rng):
    from imagetransformations_tpu.adapt.posthoc import (
        AccuracyPreservingIsotonicRegression, IsotonicRegressionCalibration,
    )

    logits = rng.standard_normal((500, 5)).astype(np.float32) * 2
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    labels = np.asarray(jax.random.categorical(jax.random.key(1), jnp.asarray(logits)))
    iso = IsotonicRegressionCalibration().fit(probs, labels)
    cal = iso.calibrate(probs)
    np.testing.assert_allclose(cal.sum(1), 1.0, atol=1e-6)
    apir = AccuracyPreservingIsotonicRegression().fit(probs, labels)
    cal2 = apir.calibrate(probs)
    np.testing.assert_array_equal(cal2.argmax(1), probs.argmax(1))  # acc preserved


def test_tta_prediction_shapes(linear_model, rng):
    from imagetransformations_tpu.adapt.tta import (
        adaptive_view_probs, fit_adaptive_weights, predict_with_tta,
    )

    w = jnp.asarray(rng.standard_normal((3072, 10)).astype(np.float32) * 0.1)

    def model_fn(x):
        return x.reshape(x.shape[0], -1).astype(jnp.float32) @ w

    x = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    probs = predict_with_tta(model_fn, x, jax.random.key(0))
    assert probs.shape == (8, 10)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    vp = adaptive_view_probs(model_fn, x, jax.random.key(1))
    labels = np.asarray(jax.random.categorical(jax.random.key(2), model_fn(x)))
    wts = fit_adaptive_weights(np.asarray(vp), labels)
    assert abs(wts.sum() - 1.0) < 1e-6 and (wts >= 0).all()


def test_evolutionary_search_finds_confident_chain(rng):
    from imagetransformations_tpu.adapt.evolution import evolutionary_search

    w = jnp.asarray(rng.standard_normal((3072, 10)).astype(np.float32) * 0.05)

    def model_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    def to_model(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    imgs = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    best = evolutionary_search(
        model_fn, to_model, imgs, population_size=6, generations=2, elite=2
    )
    assert best.fitness > 0
    assert len(best.genome) >= 1


class TestAdetOperator:
    """adet_operator (fall_2025/angellic_with_corrupt.py:65-107): per-image
    corruption + random-affine patch placement in one batched executable."""

    def test_patch_lands_with_per_image_placement(self, rng):
        from imagetransformations_tpu.adapt.patches import adet_operator

        imgs = jnp.zeros((6, 32, 32, 3), jnp.float32)
        patch = jnp.ones((8, 8, 3), jnp.float32)
        out = adet_operator(
            imgs, patch, jax.random.key(0), corruption_fns=None,
            brightness_jitter=0.0,
        )
        out = np.asarray(out)
        covered = (out > 0.5).any(axis=-1).reshape(6, -1).sum(axis=1)
        # every image gets a patch roughly the patch's area (scaled 0.8-1.2)
        assert (covered >= 0.5 * 64).all() and (covered <= 2.5 * 64).all(), covered
        # placements differ between images (per-image draws, not batch-shared)
        masks = (out > 0.5).any(axis=-1)
        assert any(not np.array_equal(masks[0], masks[i]) for i in range(1, 6))

    def test_corruption_pool_applied_outside_patch(self, rng):
        from imagetransformations_tpu.adapt.patches import adet_operator

        imgs = jnp.full((8, 32, 32, 3), 0.5, jnp.float32)
        patch = jnp.zeros((4, 4, 3), jnp.float32)
        out = np.asarray(adet_operator(imgs, patch, jax.random.key(1)))
        # default pool = {gaussian noise, blur}: noise-corrupted images must
        # differ from the constant background outside the patch
        assert (np.abs(out - 0.5) > 1e-4).any()

    def test_strict_reference_mode_scale_position_only(self, rng):
        from imagetransformations_tpu.adapt.patches import adet_operator

        imgs = jnp.zeros((4, 32, 32, 3), jnp.float32)
        patch = jnp.ones((8, 8, 3), jnp.float32)
        out = np.asarray(adet_operator(
            imgs, patch, jax.random.key(2), rotate_deg=0.0, shear_max=0.0,
            brightness_jitter=0.0, corruption_fns=None,
        ))
        # un-rotated paste: the covered region is an axis-aligned rectangle
        m = (out > 0.5).any(axis=-1)
        for i in range(4):
            ys, xs = np.where(m[i])
            assert m[i][ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()


def test_evaluate_with_tent_scan_matches_loop(rng):
    """The scanned equal-batch fast path (lax.scan + in-graph accuracy)
    must reproduce the per-batch reference loop exactly for all three
    protocols, including a ragged tail batch continuing from the scanned
    state."""
    from imagetransformations_tpu.adapt.tent import (
        evaluate_with_tent, image_entropy, init_tent, make_tent_step,
        merge_params,
    )

    w = jnp.asarray(rng.standard_normal((48, 10)).astype(np.float32))
    params = {
        "bn_scale": jnp.ones((48,)),
        "bn_bias": jnp.zeros((48,)),
        "head": {"w": w},
    }

    def model_apply(p, x):
        f = x.reshape(x.shape[0], -1)
        f = f * p["bn_scale"] + p["bn_bias"]
        return f @ p["head"]["w"]

    raws = [
        jnp.asarray(rng.integers(0, 256, (16, 4, 4, 3), dtype=np.uint8))
        for _ in range(4)
    ] + [jnp.asarray(rng.integers(0, 256, (7, 4, 4, 3), dtype=np.uint8))]
    xs = [r.astype(jnp.float32) / 255.0 for r in raws]
    ys = [jnp.asarray(rng.integers(0, 10, (r.shape[0],)), jnp.int32) for r in raws]
    batches = list(zip(xs, raws))

    def reference_loop(protocol, lr=0.05, thr=1.16):
        state0, tx = init_tent(params, lr)
        step = make_tent_step(model_apply, tx)
        state, correct, total = state0, 0, 0
        for (xb, raw), yb in zip(batches, ys):
            if protocol == "reset":
                state = state0
            if protocol == "conditional":
                frac = float(jnp.mean(
                    (image_entropy(raw) > thr).astype(jnp.float32)))
                if frac > 0.5:
                    state, logits = step(state, xb)
                else:
                    logits = model_apply(
                        merge_params(state.bn_params, state.frozen_params), xb)
            else:
                state, logits = step(state, xb)
            correct += int(jnp.sum(jnp.argmax(logits, -1) == yb))
            total += int(yb.shape[0])
        return correct / total

    for protocol in ("continuous", "reset", "conditional"):
        got = evaluate_with_tent(
            model_apply, params, batches, ys, lr=0.05, protocol=protocol)
        ref = reference_loop(protocol)
        assert got == pytest.approx(ref, abs=1e-9), protocol


def test_evaluate_with_tent_rejects_mixed_batches(rng):
    from imagetransformations_tpu.adapt.tent import evaluate_with_tent

    w = jnp.asarray(rng.standard_normal((48, 10)).astype(np.float32))
    params = {"bn_scale": jnp.ones((48,)), "head": {"w": w}}

    def model_apply(p, x):
        return (x.reshape(x.shape[0], -1) * p["bn_scale"]) @ p["head"]["w"]

    x = jnp.asarray(rng.random((8, 4, 4, 3)).astype(np.float32))
    raw = jnp.asarray(rng.integers(0, 256, (8, 4, 4, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 10, (8,)), jnp.int32)
    with pytest.raises(ValueError, match="mix"):
        evaluate_with_tent(model_apply, params, [(x, raw), x], [y, y])
