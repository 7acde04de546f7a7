#!/usr/bin/env python
"""fgsm/pgd script equivalents: attack -> reverse-attack recovery matrix."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.attacks import fgsm_attack, pgd_attack, reverse_fgsm

if __name__ == "__main__":
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, *_ = get_model(xtr, ytr)
    x = to_model(jnp.asarray(xte)); y = jnp.asarray(yte)
    acc = lambda xx: float(jnp.mean(jnp.argmax(model_fn(xx), -1) == y))
    print(f"clean acc:        {acc(x):.4f}")
    for eps in (4/255, 8/255, 12/255):
        adv = fgsm_attack(model_fn, x, y, eps=eps, clip_min=float(x.min()), clip_max=float(x.max()))
        rec = reverse_fgsm(model_fn, adv, jnp.argmax(model_fn(adv), -1), eps=eps,
                           clip_min=float(x.min()), clip_max=float(x.max()))
        print(f"eps={eps:.4f}  fgsm acc: {acc(adv):.4f}  reverse-recovered: {acc(rec):.4f}")
    adv = pgd_attack(model_fn, x, y, jax.random.key(0), eps=8/255, steps=10,
                     clip_min=float(x.min()), clip_max=float(x.max()))
    print(f"pgd(10) acc:      {acc(adv):.4f}")
