"""Workflow drivers + aux subsystems (config, profiling, checkpoint, composite ops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def tiny_model(rng):
    w = jnp.asarray(rng.standard_normal((3072, 10)).astype(np.float32) * 0.02)

    def model_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    def to_model(x_u8):
        return x_u8.astype(jnp.float32) / 255.0

    return model_fn, to_model


@pytest.fixture
def data(rng):
    from imagetransformations_tpu.pipeline.datasets import synthetic

    imgs, labels = synthetic(n=64)
    return jnp.asarray(imgs), jnp.asarray(labels)


def test_uncertainty_report(tiny_model, data, tmp_path):
    from imagetransformations_tpu.workflows import uncertainty_report

    model_fn, to_model = tiny_model
    imgs, labels = data
    rep = uncertainty_report(model_fn, to_model, imgs, labels, out_dir=str(tmp_path))
    assert 0 <= rep["accuracy"] <= 1
    assert "shannon_entropy" in rep["thresholds"]
    assert (tmp_path / "shannon_entropy.png").exists()


def test_refinement_pipeline(tiny_model, data):
    from imagetransformations_tpu.workflows import refinement_pipeline

    model_fn, to_model = tiny_model
    imgs, labels = data
    out = refinement_pipeline(model_fn, to_model, imgs, labels, max_iters=3)
    assert out["n_flagged"] >= 0
    assert "acc_before" in out and "fixed" in out


def test_transform_folder(tmp_path, rng):
    from imagetransformations_tpu.workflows import transform_folder
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        ).save(src / f"im{i}.jpeg")
    out = transform_folder(str(src), str(tmp_path / "dst"))
    assert set(out) == {
        "scale", "rotation", "lighten_darken", "gaussian_noise",
        "translation", "contrast", "blur", "shear",
    }
    assert len(list((tmp_path / "dst").iterdir())) == 16  # 2 imgs x 8 types


def test_swag_pipeline_small(rng):
    from imagetransformations_tpu.models import SimpleCNN
    from imagetransformations_tpu.workflows import swag_pipeline

    model = SimpleCNN(num_classes=4)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, 8))
    variables = model.init(jax.random.key(0), x, train=True)

    out = swag_pipeline(
        model.apply,
        lambda v, xb, train, mutable: model.apply(v, xb, train, mutable=mutable),
        variables["params"], variables["batch_stats"],
        lambda: [(x, y)] * 4,
        x, jax.random.key(1), num_weight_samples=4, eval_mc_samples=3,
        max_rank=3,
    )
    assert out["probs"].shape == (8, 4)
    assert out["entropy"].shape == (8,)
    assert float(jnp.min(out["variance"])) >= 0


def test_tent_sweep_small(rng):
    from imagetransformations_tpu.workflows import tent_sweep

    w = jnp.asarray(rng.standard_normal((3072, 10)).astype(np.float32) * 0.02)
    params = {"bn_scale": jnp.ones((3072,)), "head": w}

    def apply_fn(p, x):
        f = x.reshape(x.shape[0], -1) * p["bn_scale"]
        return f @ p["head"]

    from imagetransformations_tpu.pipeline.datasets import synthetic

    imgs, labels = synthetic(n=32)
    res = tent_sweep(
        apply_fn, params, ("brightness",), (1,), jnp.asarray(imgs),
        jnp.asarray(labels), lambda u8: u8.astype(jnp.float32) / 255.0,
        jax.random.key(0), protocols=("baseline", "continuous", "conditional"),
    )
    row = res["brightness"][1]
    assert set(row) == {"baseline", "continuous", "conditional"}


def test_tent_conditional_gate_skips_low_entropy(rng, monkeypatch):
    """The image-entropy gate must SKIP adaptation on low-entropy batches and
    ADAPT on high-entropy ones (TENT_Pipelines.py:239-303)."""
    from imagetransformations_tpu.adapt import tent as T

    def apply_fn(p, x):
        f = x.reshape(x.shape[0], -1) * p["bn_scale"]
        return f @ p["head"]

    w = jnp.asarray(rng.standard_normal((48, 4)).astype(np.float32) * 0.1)
    params = {"bn_scale": jnp.ones((48,)), "head": w}

    adapt_calls = []
    real_make = T.make_tent_step

    def counting_make(model_apply, tx):
        step = real_make(model_apply, tx)

        def wrapped(state, x):
            adapt_calls.append(x.shape)
            return step(state, x)

        return wrapped

    monkeypatch.setattr(T, "make_tent_step", counting_make)

    flat = np.full((8, 4, 4, 3), 128, np.uint8)  # zero pixel entropy
    noisy = rng.integers(0, 256, (8, 4, 4, 3), dtype=np.uint8)  # high entropy
    labels = jnp.asarray(rng.integers(0, 4, 8))

    def run(raw):
        x = jnp.asarray(raw, jnp.float32).reshape(8, -1) / 255.0
        return T.evaluate_with_tent(
            apply_fn, params, [(x, jnp.asarray(raw))], [labels],
            lr=0.1, protocol="conditional",
        )

    run(flat)
    assert len(adapt_calls) == 0, "gate must skip adaptation on flat images"
    run(noisy)
    assert len(adapt_calls) == 1, "gate must adapt on high-entropy images"

    import pytest

    with pytest.raises(ValueError):  # tuples are required for the gate
        T.evaluate_with_tent(
            apply_fn, params, [jnp.zeros((8, 48))], [labels], protocol="conditional"
        )


def test_matta_vatta(rng):
    from imagetransformations_tpu.adapt.matta import (
        apply_matta, apply_vatta, find_optimal_rho, fit_matta_weights,
    )

    probs = jax.nn.softmax(jnp.asarray(rng.standard_normal((3, 50, 5)).astype(np.float32)), -1)
    labels = jnp.asarray(rng.integers(0, 5, 50))
    out_v = apply_vatta(probs, jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(out_v.sum(-1)), 1.0, atol=1e-5)
    out_m = apply_matta(probs, jnp.zeros((3, 5)))
    np.testing.assert_allclose(np.asarray(out_m.sum(-1)), 1.0, atol=1e-5)
    rho = find_optimal_rho(probs[0], probs[1], labels)
    assert 0.0 <= rho <= 1.0
    w = fit_matta_weights(probs, labels, steps=50)
    assert w.shape == (3, 5)


def test_failure_head_and_flip_analysis(rng):
    from imagetransformations_tpu.evalx.analysis import (
        FailureHead, flip_analysis, superclass_confusion_rule,
    )

    logits = jnp.asarray(rng.standard_normal((200, 10)).astype(np.float32) * 2)
    labels = jnp.asarray(rng.integers(0, 10, 200))
    feats = FailureHead.features_from_logits(logits)
    failed = jnp.argmax(logits, -1) != labels
    head = FailureHead().fit(feats, failed, steps=100)
    p = head.predict_proba(feats)
    assert p.shape == (200,) and (np.asarray(p) >= 0).all()

    fa = flip_analysis(logits, logits * 0.0, labels)
    assert fa["n"] == 200 and fa["acc_after"] <= 1.0

    c2s = jnp.asarray([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    mask = superclass_confusion_rule(logits, c2s, k=3)
    assert mask.shape == (200,)


def test_composite_ops(rng):
    from imagetransformations_tpu.ops.composite import (
        apply_background_change, apply_background_change_simple, random_crop,
    )
    from imagetransformations_tpu.oracle.stencil import background_change_mask
    from PIL import Image

    img = jnp.asarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))
    out = np.asarray(apply_background_change(img, jnp.asarray([1.0, 0.0, 0.0])))
    assert out.shape == (24, 24, 3)
    # background pixels got the solid color, foreground kept
    gray = np.asarray(Image.fromarray(np.asarray(img)).convert("L"))
    fg = background_change_mask(gray)
    np.testing.assert_array_equal(out[fg], np.asarray(img)[fg])

    simple = np.asarray(apply_background_change_simple(img, jnp.asarray([0.0, 0.0, 0.0])))
    ref = np.clip(np.trunc(np.asarray(img, np.float32) * np.float32(0.7)), 0, 255)
    np.testing.assert_array_equal(simple, ref.astype(np.uint8))

    crop = random_crop(img[None], jax.random.key(0), pad=2)
    assert crop.shape == (1, 24, 24, 3)


def test_training_fit_and_ensemble(rng):
    from imagetransformations_tpu.models import SimpleCNN
    from imagetransformations_tpu.models.training import fit, train_members
    from imagetransformations_tpu.uq.mc import ensemble_logits, mc_variance

    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, 8))
    model = SimpleCNN(num_classes=4)
    members = train_members(model, 2, lambda: [(x, y)] * 2, epochs=1)
    logits = ensemble_logits(lambda v, xb: model.apply(v, xb), members, x)
    assert logits.shape == (2, 8, 4)
    assert mc_variance(logits).shape == (8,)


def test_sgld_snapshot_ensemble(rng):
    from imagetransformations_tpu.uq.sgld import predictive_logits, sgld, stack_snapshots
    import optax

    w0 = {"w": jnp.asarray(rng.standard_normal((12, 4)).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((6, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, 6))
    tx = sgld(0.01)
    state = tx.init(w0)
    snaps = []
    params = w0
    for i in range(6):
        g = jax.grad(
            lambda p: optax.softmax_cross_entropy_with_integer_labels(
                x @ p["w"], y
            ).mean()
        )(params)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
        if i % 2 == 0:
            snaps.append(params)
    stacked = stack_snapshots(snaps)
    logits = predictive_logits(lambda p, xb: xb @ p["w"], stacked, x)
    assert logits.shape == (3, 6, 4)


def test_config_cli_and_checkpoint(tmp_path):
    from imagetransformations_tpu.utils.config import RefineConfig
    from imagetransformations_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = RefineConfig.from_cli(["--eps=0.05", "--max-iters=3"])
    assert cfg.eps == 0.05 and cfg.max_iters == 3

    tree = {"a": jnp.arange(4), "b": {"c": jnp.ones((2, 2))}}
    save_checkpoint(str(tmp_path / "ck"), tree, step=1)
    save_checkpoint(str(tmp_path / "ck"), {"a": jnp.arange(4) * 2, "b": {"c": jnp.zeros((2, 2))}}, step=2)
    restored = load_checkpoint(str(tmp_path / "ck"))  # latest = step 2
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4) * 2)


def test_profiling_counters(rng):
    from imagetransformations_tpu import ops
    from imagetransformations_tpu.utils.profiling import op_throughput

    x = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    res = op_throughput(lambda a: ops.apply_brightness(a, 0.01), x, k1=2, k2=4)
    assert res["ms_per_op"] > 0 and res["gpix_per_s"] > 0


def test_entropy_conditioned_transforms(tiny_model, data):
    from imagetransformations_tpu.adapt.conditional import (
        apply_if_entropy, batch_gate_fraction, conditional_transform_eval,
    )
    from imagetransformations_tpu.pipeline.chain import OpSpec

    model_fn, to_model = tiny_model
    imgs, labels = data
    chain = [OpSpec("sharpness", {"factor": 1.5})]
    mixed, flagged = apply_if_entropy(imgs, chain, threshold=5.0)
    assert mixed.shape == imgs.shape
    # un-flagged images unchanged
    keep = ~np.asarray(flagged)
    np.testing.assert_array_equal(np.asarray(mixed)[keep], np.asarray(imgs)[keep])
    frac = float(batch_gate_fraction(imgs, 5.0))
    assert 0.0 <= frac <= 1.0
    res = conditional_transform_eval(model_fn, to_model, imgs, labels, chain, 5.0)
    assert "accuracy_conditional" in res
