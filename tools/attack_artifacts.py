"""FGSM/PGD + angelic-patch committed science artifacts (round 5).

Mirrors the adversarial result surfaces the reference actually prints:

- attacks/fgsm.py:122,273,297-299 — clean accuracy, then an
  accuracy-vs-epsilon table (the reference sweeps eps in
  {4/355, 8/255, 12/255}).
- attacks/fgsm.py:201-219 — per-image minimal flipping-epsilon search.
- attacks/fgsm/cifar-10/fgsm_reversefgsm_cifar10.py:23-27 — reverse-FGSM
  applied to the adversarial input (the 'recovery' direction).
- attacks/fgsm/cifar-10/pgd_cifar10.py:23-47 — PGD at eps 8/255.
- pipenline/angellic.py:129-134 — universal sign-SGD patch trained under
  corruption; cifar100_angelic_entropyloss.py:41-70 — per-image
  restorative entropy-minimizing patches.

Same dataset + pseudo-label protocol as tools/full_severity_sweep.py
(labeled CIFAR is not mounted; accuracy = agreement with the eval-mode
model's clean predictions, so attacks read as prediction-flip rates and
defenses as flip recovery). Attacks run in [0,1] image space against the
normalized-input model (the reference's imagenet helpers denorm/renorm
the same way, fgsm_reversefgsm_imagenet.py:27-44).

Dispatch-floor hygiene: one jitted attack+eval executable with epsilon as
a RUNTIME operand covers the whole eps sweep (the chain.fast_compile
recipe — a per-eps static jit would pay one server-side compile per eps).

Writes RESULTS_ATTACKS.md + RESULTS_ATTACKS.json + plots/attack_eps.png.

Run (TPU): python tools/attack_artifacts.py
Smoke (tiny, any backend): python tools/attack_artifacts.py --smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tools.full_severity_sweep import CKPT, load_dataset, load_model  # noqa: E402

#: the reference's fgsm.py:297 grid (4/355 is the reference's literal typo —
#: kept as-is for parity) plus the small-eps end of its minimal-eps search
EPS_GRID = (1 / 255, 2 / 255, 4 / 355, 4 / 255, 8 / 255, 12 / 255, 16 / 255)
PGD_EPS = 8 / 255
PATCH_CORRUPTION = ("gaussian_noise", 3)


_MODEL01_CACHE = None


def _model01():
    """[0,1]-space logits fn + pseudo-labels helper from the shared loader.

    Cached: the four run_* stages share ONE checkpoint load and one
    model closure (a fresh closure per stage would also defeat the
    jitted attack executables' static-model_fn cache)."""
    global _MODEL01_CACHE
    if _MODEL01_CACHE is not None:
        return _MODEL01_CACHE
    import jax.numpy as jnp

    from imagetransformations_tpu.models.resnet import normalize_cifar

    model_fn, _to_model_space, _feats_logits = load_model()

    def model01(x01):
        return model_fn(normalize_cifar(x01))

    def to01(x_u8):
        return jnp.asarray(x_u8).astype(jnp.float32) / 255.0

    _MODEL01_CACHE = (model01, to01)
    return _MODEL01_CACHE


def _pseudo_labels(model01, x01, batch: int = 256):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(xb):
        return jnp.argmax(model01(xb), axis=-1)

    return jnp.concatenate(
        [f(x01[i : i + batch]) for i in range(0, x01.shape[0], batch)]
    )


def run_fgsm_sweep(images_u8, eps_grid=EPS_GRID, batch: int = 256):
    """Accuracy vs epsilon for FGSM and its reverse-FGSM recovery.

    The attack targets the model's own clean prediction (pseudo-label
    protocol); the recovery step uses the model's prediction ON the
    adversarial input — no label access at defense time, matching the
    refinement pipeline's deployment protocol.
    """
    import jax
    import jax.numpy as jnp
    import optax

    model01, to01 = _model01()
    x01 = to01(images_u8)
    labels = _pseudo_labels(model01, x01, batch)

    @jax.jit
    def attack_eval(xb, yb, eps):
        def ce(xin, yin):
            return optax.softmax_cross_entropy_with_integer_labels(
                model01(xin), yin
            ).mean()

        adv = jnp.clip(xb + eps * jnp.sign(jax.grad(ce)(xb, yb)), 0.0, 1.0)
        pred_adv = jnp.argmax(model01(adv), axis=-1)
        rev = jnp.clip(
            adv - eps * jnp.sign(jax.grad(ce)(adv, pred_adv)), 0.0, 1.0
        )
        pred_rev = jnp.argmax(model01(rev), axis=-1)
        return jnp.sum(pred_adv == yb), jnp.sum(pred_rev == yb)

    n = x01.shape[0]
    t0 = time.time()
    rows = []
    for eps in eps_grid:
        e = jnp.float32(eps)
        c_adv = c_rev = 0
        for i in range(0, n, batch):
            a, r = attack_eval(x01[i : i + batch], labels[i : i + batch], e)
            c_adv += int(a)
            c_rev += int(r)
        rows.append(
            {"eps": eps, "acc_adv": c_adv / n, "acc_reversed": c_rev / n}
        )
    return rows, labels, time.time() - t0


def run_minimal_eps(images_u8, labels, batch: int = 256):
    """Per-image smallest flipping eps over the 1..16/255 grid
    (attacks/fgsm.py:201-219; one vmapped executable, not a per-image loop)."""
    import jax.numpy as jnp

    from imagetransformations_tpu.attacks.fgsm import minimal_epsilon

    model01, to01 = _model01()
    x01 = to01(images_u8)
    parts = [
        np.asarray(
            minimal_epsilon(model01, x01[i : i + batch], labels[i : i + batch])
        )
        for i in range(0, x01.shape[0], batch)
    ]
    me = np.concatenate(parts)
    finite = me[np.isfinite(me)]
    return {
        "frac_flipped_le_16": float(np.isfinite(me).mean()),
        "median_eps_255": float(np.median(finite) * 255) if finite.size else None,
        "mean_eps_255": float(finite.mean() * 255) if finite.size else None,
    }


def run_pgd(images_u8, labels, eps=PGD_EPS, steps: int = 10, batch: int = 256):
    import jax
    import jax.numpy as jnp

    from imagetransformations_tpu.attacks.pgd import pgd_attack

    model01, to01 = _model01()
    x01 = to01(images_u8)

    @jax.jit
    def acc_of(xb, yb):
        return jnp.sum(jnp.argmax(model01(xb), axis=-1) == yb)

    n, correct = x01.shape[0], 0
    key = jax.random.key(11)
    for i in range(0, n, batch):
        key, k = jax.random.split(key)
        adv = pgd_attack(
            model01, x01[i : i + batch], labels[i : i + batch], k,
            eps=eps, steps=steps,
        )
        correct += int(acc_of(adv, labels[i : i + batch]))
    return {"eps": eps, "steps": steps, "acc_adv": correct / n}


def run_patches(images_u8, labels, corruption=PATCH_CORRUPTION,
                passes: int = 3, batch: int = 256, restore_limit: int = 1024):
    """Universal patch under corruption + per-image restorative patches."""
    import jax
    import jax.numpy as jnp

    from imagetransformations_tpu.adapt.patches import (
        apply_patch,
        restorative_patches_per_image,
        train_universal_patch,
    )
    from imagetransformations_tpu.evalx.harness import corrupt

    model01, to01 = _model01()
    name, sev = corruption
    n = images_u8.shape[0]
    t0 = time.time()

    @jax.jit
    def acc_of(xb, yb):
        return jnp.sum(jnp.argmax(model01(xb), axis=-1) == yb)

    # fixed eval draw; fresh training draws per pass (the reference corrupts
    # each epoch's batches anew, angellic.py:118-127)
    xc_eval = to01(corrupt(jnp.asarray(images_u8), name, sev, jax.random.key(3)))
    acc_corr = sum(
        int(acc_of(xc_eval[i : i + batch], labels[i : i + batch]))
        for i in range(0, n, batch)
    ) / n

    batches, lab_batches = [], []
    for p in range(passes):
        xc = to01(corrupt(jnp.asarray(images_u8), name, sev, jax.random.key(100 + p)))
        for i in range(0, n, batch):
            batches.append(xc[i : i + batch])
            lab_batches.append(labels[i : i + batch])
    patch = train_universal_patch(model01, batches, lab_batches)

    xp = apply_patch(xc_eval, patch, "center")
    acc_patched = sum(
        int(acc_of(xp[i : i + batch], labels[i : i + batch]))
        for i in range(0, n, batch)
    ) / n

    # restorative per-image patches on a bounded subset (one fwd+bwd x 20
    # Adam iters over the whole subset in a single scanned executable)
    xr_in = xc_eval[:restore_limit]
    acc_r_before = int(acc_of(xr_in, labels[:restore_limit])) / xr_in.shape[0]
    xr, _ = restorative_patches_per_image(model01, xr_in)
    acc_r_after = int(acc_of(xr, labels[:restore_limit])) / xr.shape[0]
    return {
        "corruption": name,
        "severity": sev,
        "acc_corrupted": acc_corr,
        "acc_universal_patch": acc_patched,
        "universal_train_batches": len(batches),
        "restorative_n": int(xr_in.shape[0]),
        "acc_restorative_before": acc_r_before,
        "acc_restorative_after": acc_r_after,
    }, time.time() - t0


def write_artifacts(fgsm_rows, min_eps, pgd_res, patch_res, meta,
                    repo: str = REPO) -> list[str]:
    paths = []
    jpath = os.path.join(repo, "RESULTS_ATTACKS.json")
    with open(jpath, "w") as f:
        json.dump(
            {"meta": meta, "fgsm": fgsm_rows, "minimal_eps": min_eps,
             "pgd": pgd_res, "patches": patch_res}, f, indent=1,
        )
    paths.append(jpath)

    lines = [
        "# Adversarial attack + angelic patch artifacts on TPU",
        "",
        f"Reference ResNet-56 checkpoint, {meta['images']} images "
        f"({meta['dataset']}). Accuracy = agreement with the model's clean "
        "predictions (pseudo-labels; see tools/full_severity_sweep.py) — "
        "attacks read as prediction-flip rates, defenses as recovery. "
        f"Device: {meta['device']}; attacks wall {meta['attack_wall_s']:.1f} s, "
        f"patches wall {meta['patch_wall_s']:.1f} s.",
        "",
        "## FGSM accuracy vs epsilon + reverse-FGSM recovery "
        "(attacks/fgsm.py:297-299, fgsm_reversefgsm_cifar10.py:23-27)",
        "",
        "| eps (x255) | FGSM acc | reverse-FGSM acc |",
        "|---|---|---|",
    ]
    for r in fgsm_rows:
        lines.append(
            f"| {r['eps'] * 255:.2f} | {r['acc_adv']:.3f} | "
            f"{r['acc_reversed']:.3f} |"
        )
    lines += [
        "",
        f"PGD (eps {pgd_res['eps'] * 255:.0f}/255, {pgd_res['steps']} steps, "
        f"random start): accuracy **{pgd_res['acc_adv']:.3f}** "
        "(pgd_cifar10.py:23-47).",
        "",
        "## Minimal flipping epsilon (attacks/fgsm.py:201-219)",
        "",
        f"- fraction of images flipped within eps <= 16/255: "
        f"**{min_eps['frac_flipped_le_16']:.3f}**",
        "- median / mean minimal eps (x255) over flipped images: "
        + (
            f"**{min_eps['median_eps_255']:.1f} / "
            f"{min_eps['mean_eps_255']:.1f}**"
            if min_eps["median_eps_255"] is not None
            else "**n/a (no image flipped within the grid)**"
        ),
        "",
        "## Angelic patches under corruption "
        "(angellic.py:129-134, cifar100_angelic_entropyloss.py:41-70)",
        "",
        f"Corruption: {patch_res['corruption']} severity "
        f"{patch_res['severity']}.",
        "",
        "| setting | accuracy |",
        "|---|---|",
        f"| corrupted, no patch | {patch_res['acc_corrupted']:.3f} |",
        f"| + universal patch (sign-SGD, "
        f"{patch_res['universal_train_batches']} train batches) | "
        f"{patch_res['acc_universal_patch']:.3f} |",
        f"| corrupted subset (n={patch_res['restorative_n']}), no patch | "
        f"{patch_res['acc_restorative_before']:.3f} |",
        f"| + per-image restorative patches (entropy min.) | "
        f"{patch_res['acc_restorative_after']:.3f} |",
        "",
        "Read the within-column gaps, not absolute levels: any input edit "
        "pays a fixed pseudo-label protocol penalty, so a defense 'works' "
        "when its patched row beats the matching unpatched CORRUPTED row. "
        "The universal sign-SGD patch (trained on fresh corruption draws, "
        "as the reference does per epoch) is the recovery signal; the "
        "per-image restorative patch minimizes predictive ENTROPY, which "
        "under pseudo-labels can buy confidence without buying agreement — "
        "the reference scores it on true CIFAR labels where the two align.",
        "",
        "Raw data: `RESULTS_ATTACKS.json`; plot: `plots/attack_eps.png`. "
        "Regenerate with `python tools/attack_artifacts.py`.",
        "",
    ]
    mpath = os.path.join(repo, "RESULTS_ATTACKS.md")
    with open(mpath, "w") as f:
        f.write("\n".join(lines))
    paths.append(mpath)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    muted, accent, ink2 = "#b5b5b5", "#2f6fd6", "#c2571a"
    os.makedirs(os.path.join(repo, "plots"), exist_ok=True)
    fig, ax = plt.subplots(figsize=(6.0, 4.0))
    xs = [r["eps"] * 255 for r in fgsm_rows]
    ax.plot(xs, [r["acc_adv"] for r in fgsm_rows], color=accent, lw=2.0,
            label="FGSM")
    ax.plot(xs, [r["acc_reversed"] for r in fgsm_rows], color=ink2, lw=1.6,
            ls="--", label="reverse-FGSM recovery")
    ax.axhline(1.0, color=muted, lw=1.2, ls=":", label="clean (pseudo-label)")
    ax.plot([pgd_res["eps"] * 255], [pgd_res["acc_adv"]], "o", color=accent,
            ms=7, mfc="white", label=f"PGD-{pgd_res['steps']}")
    ax.set_xlabel("epsilon (x255)")
    ax.set_ylabel("agreement with clean prediction")
    ax.set_ylim(0, 1.05)
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="y", color="#e6e6e6", lw=0.6)
    ax.legend(frameon=False, fontsize=8)
    ax.set_title("FGSM attack vs reverse-FGSM recovery (ResNet-56)", fontsize=9)
    fig.tight_layout()
    p1 = os.path.join(repo, "plots", "attack_eps.png")
    fig.savefig(p1, dpi=160)
    plt.close(fig)
    paths.append(p1)
    return paths


def main() -> None:
    import jax

    smoke = "--smoke" in sys.argv
    imgs = load_dataset(limit=12 if smoke else None)
    eps_grid = EPS_GRID[:2] if smoke else EPS_GRID
    fgsm_rows, labels, attack_wall = run_fgsm_sweep(imgs, eps_grid)
    min_eps = run_minimal_eps(imgs, labels)
    pgd_res = run_pgd(imgs, labels, steps=2 if smoke else 10)
    patch_res, patch_wall = run_patches(
        imgs, labels, passes=1 if smoke else 3,
        restore_limit=8 if smoke else 1024,
    )
    meta = {
        "dataset": f"{imgs.shape[0] // 2} reference imagenette JPEGs x 2 views @ 32x32",
        "images": int(imgs.shape[0]),
        "attack_wall_s": attack_wall,
        "patch_wall_s": patch_wall,
        "device": str(jax.devices()[0]),
        "checkpoint": CKPT,
        "labels": "pseudo (clean-prediction agreement)",
    }
    paths = write_artifacts(fgsm_rows, min_eps, pgd_res, patch_res, meta)
    print(
        f"fgsm {len(eps_grid)} eps in {attack_wall:.1f} s; patches in "
        f"{patch_wall:.1f} s -> " + ", ".join(paths)
    )


if __name__ == "__main__":
    main()
