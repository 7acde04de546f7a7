"""UQ metric suite: cross-checks vs sklearn/scipy and analytic cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagetransformations_tpu.uq import calibration as uc
from imagetransformations_tpu.uq import mc as umc
from imagetransformations_tpu.uq import metrics as um
from imagetransformations_tpu.uq.knn import knn_label_entropy, nearest_feature_distance
from imagetransformations_tpu.uq.mahalanobis import fit as maha_fit, score as maha_score


@pytest.fixture
def logits(rng):
    return jnp.asarray(rng.standard_normal((64, 10)).astype(np.float32) * 3)


@pytest.fixture
def labels(rng):
    return jnp.asarray(rng.integers(0, 10, 64))


def test_entropy_uniform_max():
    logits = jnp.zeros((4, 10))
    ent = um.shannon_entropy(logits)
    np.testing.assert_allclose(np.asarray(ent), np.log2(10), rtol=1e-4)


def test_msp_margin_ratio_consistency(logits):
    p = np.asarray(jax.nn.softmax(logits, axis=-1))
    top2 = np.sort(p, axis=1)[:, -2:]
    np.testing.assert_allclose(np.asarray(um.msp(logits)), top2[:, 1], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(um.margin(logits)), top2[:, 1] - top2[:, 0], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(um.ratio(logits)), top2[:, 0] / top2[:, 1], rtol=1e-4
    )


def test_energy_is_neg_logsumexp(logits):
    from scipy.special import logsumexp

    np.testing.assert_allclose(
        np.asarray(um.energy_score(logits)), -logsumexp(np.asarray(logits), axis=1),
        rtol=1e-5,
    )


def test_doctor_scores_positive(logits):
    assert (np.asarray(um.doctor_alpha(logits)) >= 0).all()
    assert (np.asarray(um.doctor_beta(logits)) >= 0).all()


def test_tsallis_renyi_limits(logits):
    # q->1 both converge to Shannon (nats); check at q=1.001
    sh = um.shannon_entropy(logits, base2=False)
    ts = um.tsallis_entropy(logits, q=1.001)
    re = um.renyi_entropy(logits, alpha=1.001)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(sh), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(re), np.asarray(sh), rtol=2e-2)


def test_auroc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    scores = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    targets = jnp.asarray((rng.random(200) < 0.3).astype(np.int32))
    ours = float(uc.auroc(scores, targets))
    ref = roc_auc_score(np.asarray(targets), np.asarray(scores))
    assert abs(ours - ref) < 1e-5


def test_aupr_matches_sklearn(rng):
    from sklearn.metrics import average_precision_score

    scores = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    targets = jnp.asarray((rng.random(200) < 0.3).astype(np.int32))
    ours = float(uc.aupr(scores, targets))
    ref = average_precision_score(np.asarray(targets), np.asarray(scores))
    assert abs(ours - ref) < 1e-3


def test_ece_perfect_calibration():
    # construct probs where confidence == accuracy in every bin
    probs = jnp.asarray([[0.9, 0.1]] * 10)
    labels = jnp.asarray([0] * 9 + [1])  # 90% correct at 0.9 confidence
    assert float(uc.ece(probs, labels)) < 0.011


def test_youden_threshold_separates():
    scores = jnp.asarray(np.concatenate([np.zeros(50), np.ones(50)]).astype(np.float32))
    targets = jnp.asarray(np.concatenate([np.zeros(50), np.ones(50)]).astype(np.int32))
    thr = float(uc.youden_threshold(scores, targets))
    assert 0.0 <= thr <= 1.0


def test_fit_temperature_recovers_scale(rng):
    # generate logits miscalibrated by factor 2: T* should be ~2
    true_logits = jnp.asarray(rng.standard_normal((2000, 10)).astype(np.float32) * 2)
    labels = jax.random.categorical(jax.random.key(0), true_logits)
    t = float(uc.fit_temperature(true_logits * 2.0, labels))
    assert 1.6 < t < 2.6


def test_spearman_matches_scipy(rng):
    from scipy.stats import spearmanr

    x = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    y = x * 0.5 + jnp.asarray(rng.standard_normal(100).astype(np.float32))
    ours = float(uc.spearmanr(x, y))
    ref = spearmanr(np.asarray(x), np.asarray(y)).statistic
    assert abs(ours - ref) < 1e-4


def test_bald_nonnegative_and_zero_when_deterministic(rng):
    mc = jnp.asarray(rng.standard_normal((10, 32, 5)).astype(np.float32))
    assert (np.asarray(umc.bald(mc)) > -1e-4).all()
    same = jnp.broadcast_to(mc[:1], mc.shape)
    np.testing.assert_allclose(np.asarray(umc.bald(same)), 0.0, atol=1e-5)


def test_mahalanobis_class_agnostic(rng):
    feats = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    state = maha_fit(feats)
    d_in = maha_score(state, feats[:10])
    d_out = maha_score(state, feats[:10] + 10.0)
    assert float(jnp.mean(d_out)) > float(jnp.mean(d_in)) * 2


def test_mahalanobis_per_class(rng):
    feats = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((100, 8)) + 5, rng.standard_normal((100, 8)) - 5]
        ).astype(np.float32)
    )
    labels = jnp.asarray([0] * 100 + [1] * 100)
    state = maha_fit(feats, labels, num_classes=2)
    near0 = maha_score(state, jnp.full((1, 8), 5.0))
    far = maha_score(state, jnp.zeros((1, 8)))
    assert float(far[0]) > float(near0[0])


def test_knn_entropy_and_nn_distance(rng):
    feats = jnp.asarray(rng.standard_normal((200, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, 200))
    ent, maj = knn_label_entropy(feats, labels, feats[:5], k=10)
    assert ent.shape == (5,) and maj.shape == (5,)
    d, lb = nearest_feature_distance(feats, labels, feats[:5])
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(labels[:5]))


def test_swag_update_and_sample(rng):
    from imagetransformations_tpu.uq import swag

    params = {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}
    state = swag.init(params, max_rank=5)
    for i in range(8):
        p = {"w": params["w"] + 0.1 * i}
        state = swag.update(state, p)
    assert int(state.n_models) == 8
    sample = swag.sample(state, jax.random.key(0))
    assert sample["w"].shape == (4, 4)
    stacked = swag.sample_many(state, jax.random.key(1), 3)
    assert stacked["w"].shape == (3, 4, 4)
    # mean of many samples approaches the SWA mean
    many = swag.sample_many(state, jax.random.key(2), 200, diag_scale=0.1)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(many["w"], 0)), np.asarray(state.mean["w"]), atol=0.3
    )


def test_sgld_noise_scale(rng):
    from imagetransformations_tpu.uq.sgld import sgld

    tx = sgld(learning_rate=0.01, temperature=1.0)
    params = {"w": jnp.zeros((1000,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.zeros((1000,))}, state, params)
    std = float(jnp.std(updates["w"]))
    expected = np.sqrt(2 * 0.01)
    assert abs(std - expected) / expected < 0.15


def test_laplace_uncertainty_increases_ood(rng):
    from imagetransformations_tpu.uq import laplace as ll

    feats = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 10)).astype(np.float32))
    b = jnp.zeros((10,))
    state = ll.fit(feats, w, b)
    v_in = ll.closed_form_variance(state, feats[:20])
    v_out = ll.closed_form_variance(state, feats[:20] * 10.0)
    assert float(jnp.mean(v_out)) > float(jnp.mean(v_in))


def test_odin_runs_and_improves_confidence(rng):
    from imagetransformations_tpu.uq.odin import odin_score

    w = jnp.asarray(rng.standard_normal((48, 10)).astype(np.float32) * 0.2)

    def model_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    x = jnp.asarray(rng.standard_normal((8, 4, 4, 3)).astype(np.float32))
    s = odin_score(model_fn, x, temperature=1000.0, eps=0.0014)
    base = jnp.max(jax.nn.softmax(model_fn(x) / 1000.0, -1), -1)
    assert (np.asarray(s) >= np.asarray(base) - 1e-4).all()


def test_coverage_for_accuracy_reference_semantics():
    """swag/metric.py:407-446 parity: the metric is the FIRST prefix
    (most-confident-first) whose running accuracy drops below target, with
    the start_index=200 noise rule — an early dip followed by recovery
    must report the early crossing, not the max coverage."""
    from imagetransformations_tpu.uq.calibration import coverage_for_accuracy

    conf = jnp.asarray(np.linspace(1.0, 0.0, 1000, dtype=np.float32))
    correct = np.ones(1000, np.float32)
    correct[10:12] = 0.0  # dip at prefix 11: 10/11 = 0.909 < 0.95
    cov = float(coverage_for_accuracy(conf, jnp.asarray(correct), 0.95))
    assert abs(cov - 0.01) < 1e-6, cov  # reference returns argmax index/n = 10/1000
    # never dropping below target returns 0 (reference argmax-of-all-False)
    cov_all = float(coverage_for_accuracy(conf, jnp.ones(1000), 0.95))
    assert cov_all == 0.0
    # a late persistent drop reports the non-strict (>=200) crossing
    correct2 = np.ones(1000, np.float32)
    correct2[300:] = 0.0  # running mean falls below 0.95 soon after 300
    cov2 = float(coverage_for_accuracy(conf, jnp.asarray(correct2), 0.95))
    assert 0.3 < cov2 < 0.35, cov2
