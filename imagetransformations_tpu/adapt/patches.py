"""Angelic (restorative) patches — gradient-trained patches that REDUCE loss.

Parity map (reference -> here):
- pipenline/angellic.py:53-76    -> apply_patch (center / random position)
- pipenline/angellic.py:94-143   -> train_universal_patch: sign-SGD patch
  update minimizing CE under corruption (patch.data.sub_(lr*sign(grad)))
- pipenline/cifar100_angelic_entropyloss.py:41-70 -> per-image restorative
  patch optimized by Adam on entropy for 20 iters (vmapped across the batch
  instead of the reference's per-image Python loop)
- fall_2025/angellic_patches_fgsm_cifar_transformations.py:35-47 ->
  apply_transformed_patch (random scale+rotation at apply time, EOT-style)
- fall_2025/angellic_with_corrupt.py:65-107 -> adet_operator (random-affine
  patch application)
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def apply_patch(
    images: jnp.ndarray, patch: jnp.ndarray, position: str = "center", key=None
) -> jnp.ndarray:
    """Paste a [ph, pw, C] patch into every image (model space, f32)."""
    n, h, w, c = images.shape
    ph, pw = patch.shape[:2]
    if position == "center":
        y0, x0 = (h - ph) // 2, (w - pw) // 2
        return images.at[:, y0 : y0 + ph, x0 : x0 + pw, :].set(patch)
    # random position per batch draw (shared across batch, like the reference
    # per-image draws; per-image via vmap with dynamic_update_slice)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - ph + 1)
    x0 = jax.random.randint(kx, (), 0, w - pw + 1)
    return jax.vmap(
        lambda im: jax.lax.dynamic_update_slice(im, patch, (y0, x0, 0))
    )(images)


def apply_transformed_patch(
    images: jnp.ndarray, patch: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """EOT-style apply: random scale in [0.8,1.2] + rotation +-15deg first."""
    from imagetransformations_tpu.ops.warp import affine_warp, rotation_matrix, zoom_matrix, compose_matrices

    ks, kr, kp = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    angle = jax.random.uniform(kr, (), minval=-15.0, maxval=15.0)
    ph, pw = patch.shape[:2]
    m = compose_matrices(
        zoom_matrix(scale, pw, ph), rotation_matrix(angle, pw, ph)
    )
    tp = affine_warp(patch[None], m, method="bilinear", fill=0.0)[0]
    return apply_patch(images, tp, "random", kp)


def adet_operator(
    images: jnp.ndarray,
    patch: jnp.ndarray,
    key: jax.Array,
    scale_range: tuple[float, float] = (0.8, 1.2),
    rotate_deg: float = 15.0,
    shear_max: float = 0.15,
    brightness_jitter: float = 0.2,
    corruption_fns: "tuple | None | str" = "default",
) -> jnp.ndarray:
    """ADET operator: per-image random corruption + random-affine patch paste.

    Reference (fall_2025/angellic_with_corrupt.py:65-107): for EACH image,
    sample a corruption from Delta = {gaussian noise 0.05, 3x3 blur}, a random
    patch scale in [0.8, 1.2], and a random location, then paste the scaled
    patch. This version runs the whole batch in ONE executable: every image
    gets its own (scale, rotation, shear, brightness, position) draw via a
    single batched inverse-map affine warp of a patch+alpha canvas, and the
    corruption choice is an in-graph select over the pool (no per-image
    Python loop, no recompiles). rotation/shear/brightness extend the
    reference's scale+position family (set them to 0 for strict parity).

    images: [N,H,W,C] model-space f32 in [0,1]; patch: [ph,pw,C].
    """
    from imagetransformations_tpu.ops.warp import affine_warp

    n, h, w, c = images.shape
    ph, pw = patch.shape[:2]
    ks, kr, ksh, kb, ky, kx, kc, kn = jax.random.split(key, 8)

    # per-image corruption choice from Delta (reference :58-62)
    if corruption_fns == "default":
        sigma_taps = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)

        def blur3(x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            xh = sum(sigma_taps[i] * xp[:, 1:-1, i : i + w] for i in range(3))
            xhp = jnp.pad(xh, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
            return sum(sigma_taps[i] * xhp[:, i : i + h] for i in range(3))

        corruption_fns = (
            lambda x: jnp.clip(x + 0.05 * jax.random.normal(kn, x.shape), 0.0, 1.0),
            blur3,
        )
    if corruption_fns:
        idx = jax.random.randint(kc, (n, 1, 1, 1), 0, len(corruption_fns))
        out = images
        for i, fn in enumerate(corruption_fns):
            out = jnp.where(idx == i, fn(images), out)
        images = out

    # per-image affine draws
    scale = jax.random.uniform(ks, (n,), minval=scale_range[0], maxval=scale_range[1])
    angle = jax.random.uniform(kr, (n,), minval=-rotate_deg, maxval=rotate_deg)
    shear = jax.random.uniform(ksh, (n,), minval=-shear_max, maxval=shear_max)
    bright = jax.random.uniform(
        kb, (n,), minval=1.0 - brightness_jitter, maxval=1.0 + brightness_jitter
    )
    # random location keeping the (scaled) patch inside the canvas
    ext = scale * jnp.float32(max(ph, pw)) * (1.0 + jnp.abs(shear))
    y0 = jax.random.uniform(ky, (n,)) * jnp.maximum(h - ext, 0.0)
    x0 = jax.random.uniform(kx, (n,)) * jnp.maximum(w - ext, 0.0)

    # inverse map: canvas (x,y) -> patch coords. linear part = (1/s) * K^-1 R^-1
    rad = jnp.deg2rad(angle)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    inv_s = 1.0 / scale
    # R^-1 = [[cos, sin], [-sin, cos]]; K = [[1, sh],[0,1]] -> K^-1 = [[1,-sh],[0,1]]
    a_ = inv_s * (cos - shear * (-sin))
    b_ = inv_s * (sin - shear * cos)
    d_ = inv_s * (-sin)
    e_ = inv_s * cos
    # anchor: canvas point (x0 + s*pw/2, y0 + s*ph/2) maps to patch center
    cxs = x0 + scale * pw / 2.0
    cys = y0 + scale * ph / 2.0
    c_ = pw / 2.0 - a_ * cxs - b_ * cys
    f_ = ph / 2.0 - d_ * cxs - e_ * cys
    m = jnp.stack([a_, b_, c_, d_, e_, f_], axis=-1)

    pa = jnp.concatenate([patch, jnp.ones((ph, pw, 1), patch.dtype)], axis=-1)
    canvas = affine_warp(
        jnp.broadcast_to(pa[None], (n, ph, pw, c + 1)), m,
        out_size=(h, w), method="bilinear", fill=0.0,
    )
    alpha = canvas[..., -1:] >= 0.5
    pimg = jnp.clip(canvas[..., :c] * bright.reshape(-1, 1, 1, 1), 0.0, 1.0)
    return jnp.where(alpha, pimg, images)


def train_universal_patch(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    batches_iter,
    labels_iter,
    patch_hw: tuple[int, int] = (20, 20),
    channels: int = 3,
    lr: float = 0.01,
    corruption_fn=None,
    key: jax.Array | None = None,
    position: str = "center",
) -> jnp.ndarray:
    """Sign-SGD universal patch minimizing CE under corruption.

    Reference trains 50 epochs over CIFAR-10 train (angellic.py:129-134:
    ``patch -= lr * sign(grad)``). Host loop over batches; the update step
    is one jitted call.
    """
    if key is None:
        key = jax.random.key(0)
    patch = jnp.zeros((*patch_hw, channels), jnp.float32) + 0.5

    @jax.jit
    def step(patch, x, y, k):
        def loss_fn(p):
            xc = corruption_fn(x, k) if corruption_fn is not None else x
            xp = apply_patch(xc, p, position, k)
            logits = model_fn(xp)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        g = jax.grad(loss_fn)(patch)
        return jnp.clip(patch - lr * jnp.sign(g), 0.0, 1.0)

    for x, y in zip(batches_iter, labels_iter):
        key, k = jax.random.split(key)
        patch = step(patch, x, y, k)
    return patch


@functools.partial(jax.jit, static_argnames=("model_fn", "iters", "lr", "patch_hw"))
def restorative_patches_per_image(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    patch_hw: tuple[int, int] = (8, 8),
    iters: int = 20,
    lr: float = 0.1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image 8x8 patch minimizing that image's predictive entropy.

    Reference get_restorative_patch (cifar100_angelic_entropyloss.py:41-70)
    optimizes image-by-image; here all images optimize simultaneously —
    the patch is a [B, ph, pw, C] leaf updated by Adam inside lax.scan.
    Returns (patched_images, patches).
    """
    n, h, w, c = x.shape
    ph, pw = patch_hw
    y0, x0 = (h - ph) // 2, (w - pw) // 2
    patches = jnp.zeros((n, ph, pw, c), jnp.float32) + 0.5
    tx = optax.adam(lr)

    def paste(p):
        return x.at[:, y0 : y0 + ph, x0 : x0 + pw, :].set(p)

    def loss_fn(p):
        logits = model_fn(paste(p))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))

    def body(carry, _):
        p, opt_state = carry
        g = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(g, opt_state, p)
        p = jnp.clip(optax.apply_updates(p, updates), 0.0, 1.0)
        return (p, opt_state), None

    (patches, _), _ = jax.lax.scan(body, (patches, tx.init(patches)), None, length=iters)
    return paste(patches), patches
