"""Bayesian-by-backprop CNN (reparameterized weights + KL to a N(0, sigma) prior).

Parity with pipeline/metrics/baysian.py:32-130: BayesianConv2d/BayesianLinear
with weight ~ N(mu, softplus(rho)^2) reparameterization, KL accumulated per
layer, architecture conv5x5(64,pad2)+BN+pool / conv5x5(128,pad2)+BN+pool /
fc 256-128-10. TPU-first: the T-sample predictive pass is a ``vmap`` over the
sample axis instead of a Python loop (kills the reference's O(N*T) loop,
baysian.py:177-186).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kl_normal(mu, sigma, prior_sigma):
    """KL( N(mu, sigma^2) || N(0, prior_sigma^2) ), summed."""
    var_ratio = (sigma / prior_sigma) ** 2
    return 0.5 * jnp.sum(var_ratio + (mu / prior_sigma) ** 2 - 1.0 - jnp.log(var_ratio))


class BayesianConv(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    padding: int = 0
    prior_sigma: float = 1.0

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        shape = (kh, kw, cin, self.features)
        mu = self.param("mu", nn.initializers.normal(0.1), shape)
        rho = self.param("rho", nn.initializers.constant(-3.0), shape)
        bmu = self.param("bias_mu", nn.initializers.zeros, (self.features,))
        brho = self.param("bias_rho", nn.initializers.constant(-3.0), (self.features,))
        sigma = nn.softplus(rho)
        bsigma = nn.softplus(brho)
        eps_w = jax.random.normal(self.make_rng("sample"), shape)
        eps_b = jax.random.normal(self.make_rng("sample"), (self.features,))
        w = mu + sigma * eps_w
        b = bmu + bsigma * eps_b
        kl = _kl_normal(mu, sigma, self.prior_sigma) + _kl_normal(bmu, bsigma, self.prior_sigma)
        self.sow("losses", "kl", kl)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b


class BayesianDense(nn.Module):
    features: int
    prior_sigma: float = 1.0

    @nn.compact
    def __call__(self, x):
        shape = (x.shape[-1], self.features)
        mu = self.param("mu", nn.initializers.normal(0.1), shape)
        rho = self.param("rho", nn.initializers.constant(-3.0), shape)
        bmu = self.param("bias_mu", nn.initializers.zeros, (self.features,))
        brho = self.param("bias_rho", nn.initializers.constant(-3.0), (self.features,))
        sigma = nn.softplus(rho)
        bsigma = nn.softplus(brho)
        w = mu + sigma * jax.random.normal(self.make_rng("sample"), shape)
        b = bmu + bsigma * jax.random.normal(self.make_rng("sample"), (self.features,))
        kl = _kl_normal(mu, sigma, self.prior_sigma) + _kl_normal(bmu, bsigma, self.prior_sigma)
        self.sow("losses", "kl", kl)
        return x @ w + b


class BayesianCNN(nn.Module):
    num_classes: int = 10
    prior_sigma: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        x = BayesianConv(64, (5, 5), padding=2, prior_sigma=self.prior_sigma, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = BayesianConv(128, (5, 5), padding=2, prior_sigma=self.prior_sigma, name="conv2")(x)
        x = nn.relu(norm(name="bn2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))  # [N, 8*8*128] for 32x32 input
        x = nn.relu(BayesianDense(256, self.prior_sigma, name="fc1")(x))
        x = nn.relu(BayesianDense(128, self.prior_sigma, name="fc2")(x))
        return BayesianDense(self.num_classes, self.prior_sigma, name="fc3")(x)


def kl_loss(variables) -> jnp.ndarray:
    """Sum all sown per-layer KL terms (get_kl_loss parity, baysian.py:126-130)."""
    leaves = jax.tree_util.tree_leaves(variables.get("losses", {}))
    return sum(jnp.sum(l) for l in leaves) if leaves else jnp.float32(0.0)


def predictive_samples(model, variables, x, key, num_samples: int = 50, train: bool = False):
    """[T,N,C] logits from T weight samples — vmapped, one compiled call."""
    keys = jax.random.split(key, num_samples)

    def one(k):
        out = model.apply(
            variables, x, train, rngs={"sample": k}, mutable=["losses"]
        )
        return out[0]

    return jax.vmap(one)(keys)
