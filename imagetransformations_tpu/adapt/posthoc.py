"""Post-hoc calibration suite (fall_2025/post_hoc_aaryaa.py).

Parity map:
- TemperatureScaling (:72-110)           -> TemperatureScaling (jit Adam on
  log T instead of Nelder-Mead; same optimum)
- EnsembleTemperatureScaling (:112-163)  -> weights over fixed T grid
  {1, 1.5, 2, 3, 4}, simplex-projected, fit by Adam on NLL
- IsotonicRegressionCalibration (:165-216) -> per-class one-vs-rest sklearn
  isotonic fits (host-side; calibration fits are tiny)
- AccuracyPreservingIsotonicRegression (:218-274) -> isotonic on max-prob
  with rank preservation within predicted class
- TTABoostedCalibration (:276-350)       -> average calibrated probs over
  T=4 augmented views (batched augmentation stack)
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from imagetransformations_tpu.uq.calibration import fit_temperature


# module-level jitted calibrate kernels: ONE dispatch per call with the
# fitted parameters as runtime operands (eager softmax/einsum chains cost
# ~40 ms per op on the tunneled runtime), one cached executable per logits
# shape shared across calibrator instances
@jax.jit
def _ts_calibrate(logits, temperature):
    return jax.nn.softmax(logits / temperature, axis=-1)


@jax.jit
def _ets_calibrate(logits, ts, w):
    member = jax.nn.softmax(logits[None] / ts[:, None, None], axis=-1)
    return jnp.einsum("t,tbc->bc", w, member)


@dataclasses.dataclass
class TemperatureScaling:
    temperature: float = 1.0

    def fit(self, logits: jnp.ndarray, labels: jnp.ndarray) -> "TemperatureScaling":
        self.temperature = float(fit_temperature(logits, labels))
        return self

    def calibrate(self, logits: jnp.ndarray) -> jnp.ndarray:
        return _ts_calibrate(logits, np.float32(self.temperature))


@dataclasses.dataclass
class EnsembleTemperatureScaling:
    temperatures: tuple[float, ...] = (1.0, 1.5, 2.0, 3.0, 4.0)
    weights: np.ndarray | None = None

    def fit(self, logits: jnp.ndarray, labels: jnp.ndarray, steps: int = 300):
        ts = jnp.asarray(self.temperatures)

        def probs(w_logits):
            w = jax.nn.softmax(w_logits)
            member = jax.nn.softmax(logits[None] / ts[:, None, None], axis=-1)
            return jnp.einsum("t,tbc->bc", w, member)

        def loss(w_logits):
            p = probs(w_logits)
            lp = jnp.log(jnp.clip(p, 1e-12, 1.0))
            return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=1))

        w = jnp.zeros((len(self.temperatures),))
        tx = optax.adam(0.05)
        state = tx.init(w)

        @jax.jit
        def step(carry, _):
            w, st = carry
            g = jax.grad(loss)(w)
            updates, st = tx.update(g, st)
            return (w + updates, st), None

        (w, _), _ = jax.lax.scan(step, (w, state), None, length=steps)
        self.weights = np.asarray(jax.nn.softmax(w))
        return self

    def calibrate(self, logits: jnp.ndarray) -> jnp.ndarray:
        return _ets_calibrate(
            logits,
            np.asarray(self.temperatures, np.float32),
            np.asarray(self.weights, np.float32),
        )


class IsotonicRegressionCalibration:
    """Per-class one-vs-rest isotonic regression (sklearn on host)."""

    def __init__(self):
        self._models = []

    def fit(self, probs: np.ndarray, labels: np.ndarray):
        from sklearn.isotonic import IsotonicRegression

        probs = np.asarray(probs)
        labels = np.asarray(labels)
        c = probs.shape[-1]
        self._models = []
        for k in range(c):
            ir = IsotonicRegression(out_of_bounds="clip", y_min=0.0, y_max=1.0)
            ir.fit(probs[:, k], (labels == k).astype(np.float64))
            self._models.append(ir)
        return self

    def calibrate(self, probs: np.ndarray) -> np.ndarray:
        probs = np.asarray(probs)
        out = np.stack(
            [m.predict(probs[:, k]) for k, m in enumerate(self._models)], axis=1
        )
        s = out.sum(axis=1, keepdims=True)
        return out / np.maximum(s, 1e-12)


class AccuracyPreservingIsotonicRegression:
    """IRM variant: isotonic on the max prob only, argmax preserved
    (post_hoc_aaryaa.py:218-274)."""

    def __init__(self):
        self._model = None

    def fit(self, probs: np.ndarray, labels: np.ndarray):
        from sklearn.isotonic import IsotonicRegression

        probs = np.asarray(probs)
        conf = probs.max(axis=1)
        correct = (probs.argmax(axis=1) == np.asarray(labels)).astype(np.float64)
        self._model = IsotonicRegression(out_of_bounds="clip", y_min=1e-6, y_max=1.0)
        self._model.fit(conf, correct)
        return self

    def calibrate(self, probs: np.ndarray) -> np.ndarray:
        probs = np.asarray(probs)
        conf = probs.max(axis=1, keepdims=True)
        new_conf = self._model.predict(conf[:, 0])[:, None]
        # argmax preservation: the rescaled runner-up p2*(1-nc)/(1-conf) must
        # stay below nc, i.e. nc >= p2 / (1 - conf + p2)
        is_max = probs == conf
        p2 = np.where(is_max, -np.inf, probs).max(axis=1, keepdims=True)
        floor = p2 / np.maximum(1.0 - conf + p2, 1e-12)
        new_conf = np.clip(np.maximum(new_conf, floor * (1.0 + 1e-6) + 1e-9), 1e-9, 1.0)
        rest = probs * (1.0 - new_conf) / np.maximum(1.0 - conf, 1e-12)
        out = np.where(is_max, new_conf, rest)
        return out / np.maximum(out.sum(axis=1, keepdims=True), 1e-12)


class TTABoostedCalibration:
    """Average calibrated probs over augmented views (post_hoc:276-350)."""

    def __init__(self, base_calibrator, augment_fns):
        self.base = base_calibrator
        self.augment_fns = augment_fns  # list of batched image->image fns

    def fit(self, logits, labels):
        self.base.fit(logits, labels)
        return self

    def calibrate_with_model(self, model_fn, images) -> jnp.ndarray:
        views = [images] + [f(images) for f in self.augment_fns]
        probs = [jnp.asarray(self.base.calibrate(model_fn(v))) for v in views]
        return jnp.mean(jnp.stack(probs), axis=0)
