#!/usr/bin/env python
"""Corruption-generator fidelity vs the reference's REAL CIFAR-10-C samples.

The reference ships 95 real CIFAR-10-C PNGs at
/root/reference/CIFAR-10-C/store/ (written by transformation.py:19-71).
Their filenames claim severities 1-5, but the writer's indices
[0, 1001, 2002, 3003, 4004] all fall inside the severity-1 slab of the
(50000, 32, 32, 3) arrays (severity s spans rows [(s-1)*10000, s*10000)),
so every sample is a TRUE SEVERITY-1 corruption of one of five distinct
test images (0, 1001, 2002, 3003, 4004). That mislabeling is exploitable:
per corruption we get five real severity-1 samples with five distinct
bases, and the jpeg_compression samples (quality ~80, visually near-clean)
give approximate clean bases for the SAME five images — enabling
same-base, image-level comparison of our on-device generators against the
real data.

Outputs:
  plots/corruption_fidelity.png  — sample sheet: per corruption, columns
                                   [approx-clean base | real CIFAR-10-C |
                                   ours] for base image idx 0
  CORRUPTION_FIDELITY.json       — per-corruption statistics of real vs
                                   generated (residual std, mean shift,
                                   high-frequency energy ratio, PSNR
                                   ours-vs-real) over the five bases

tests/test_corruption_fidelity.py consumes the same statistics as gates.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

STORE = "/root/reference/CIFAR-10-C/store"
BASE_IDS = (0, 1001, 2002, 3003, 4004)

#: the canonical 15 evaluated by the reference
#: (attacks/uncertainty/FINAL_cifar_corrupted.py:22-27)
CANONICAL = (
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression",
)
#: the store's four non-canonical corruptions — generated too (19/19)
EXTRAS = ("speckle_noise", "gaussian_blur", "spatter", "saturate")
ALL19 = CANONICAL + EXTRAS


def load_real() -> dict[str, dict[int, np.ndarray]]:
    """{corruption: {base_idx: u8[32,32,3]}} — all true severity 1."""
    out: dict[str, dict[int, np.ndarray]] = {}
    for f in sorted(glob.glob(os.path.join(STORE, "*.png"))):
        m = re.match(r"(.+)_severity\d_idx(\d+)\.png", os.path.basename(f))
        if m is None:  # skip stray files with unexpected names
            continue
        corr, idx = m.group(1), int(m.group(2))
        out.setdefault(corr, {})[idx] = np.asarray(Image.open(f).convert("RGB"))
    return out


def approx_clean_bases(real: dict) -> dict[int, np.ndarray]:
    """jpeg_compression severity-1 (quality 80) as near-clean stand-ins."""
    return dict(real["jpeg_compression"])


def _hf(a: np.ndarray) -> float:
    """High-frequency energy proxy: mean |horizontal difference| of luma."""
    g = a.astype(np.float64).mean(-1)
    return float(np.abs(np.diff(g, axis=1)).mean())


def stats_vs_base(img: np.ndarray, base: np.ndarray) -> dict[str, float]:
    d = img.astype(np.float64) - base.astype(np.float64)
    return {
        "mean_shift": float(d.mean()),
        "resid_std": float(d.std()),
        "hf_ratio": _hf(img) / max(_hf(base), 1e-9),
    }


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0**2 / max(mse, 1e-9)))


def generate_ours(bases: dict[int, np.ndarray], severity: int = 1):
    """Our on-device generators at the given severity over the base images."""
    import jax
    import jax.numpy as jnp

    from imagetransformations_tpu.evalx.harness import corrupt

    batch = jnp.asarray(np.stack([bases[i] for i in BASE_IDS]))
    key = jax.random.PRNGKey(0)
    out = {}
    for name in ALL19:
        gen = np.asarray(corrupt(batch, name, severity, key))
        out[name] = {i: gen[k] for k, i in enumerate(BASE_IDS)}
    return out


def compare(real: dict, bases: dict, ours: dict) -> dict[str, dict]:
    """Per-corruption mean statistics for real-vs-base and ours-vs-base.

    The "real" column is CONFOUNDED by base-approximation error: the clean
    bases are the jpeg-q80 store samples, so real_resid^2 ~= true_resid^2
    + base_err^2. ``base_error_rms`` estimates base_err in quadrature from
    brightness (a PIL-exact near-linear op our generator reproduces
    faithfully: base_err^2 ~= real_bright^2 - ours_bright^2 — round-4
    estimate ~7.7 LSB RMS, consistent across brightness / defocus /
    pixelate / gaussian_blur). Each corruption's
    ``real.resid_std_deconf`` = sqrt(max(real^2 - base_err^2, 0)) is the
    deconfounded target to compare ``ours.resid_std`` against — decisive
    for weak corruptions (severity-1 defocus is a near-delta disk PSF:
    raw real 7.35 vs ours 1.91 looked like a 4x mismatch but is ~0-2.2
    vs 1.91 once the ~7 LSB base error is removed; VERDICT r3 item 6).
    """
    report: dict[str, dict] = {}
    for name in ALL19:
        rs, os_, ps = [], [], []
        for i in BASE_IDS:
            rs.append(stats_vs_base(real[name][i], bases[i]))
            os_.append(stats_vs_base(ours[name][i], bases[i]))
            ps.append(psnr(ours[name][i], real[name][i]))
        mean = lambda lst, k: float(np.mean([d[k] for d in lst]))
        report[name] = {
            "real": {k: mean(rs, k) for k in rs[0]},
            "ours": {k: mean(os_, k) for k in os_[0]},
            "psnr_ours_vs_real": float(np.mean(ps)),
        }
    br, bo = report["brightness"]["real"], report["brightness"]["ours"]
    base_err = float(np.sqrt(max(br["resid_std"] ** 2 - bo["resid_std"] ** 2, 0.0)))
    for name in ALL19:
        r = report[name]["real"]
        r["resid_std_deconf"] = float(
            np.sqrt(max(r["resid_std"] ** 2 - base_err**2, 0.0))
        )
    report["base_error_rms"] = base_err
    return report


def sample_sheet(real: dict, bases: dict, ours: dict, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(ALL19)
    fig, axes = plt.subplots(n, 3, figsize=(4.2, 1.35 * n))
    for r, name in enumerate(ALL19):
        for col, (img, title) in enumerate(
            [
                (bases[0], "base (approx clean)"),
                (real[name][0], "real CIFAR-10-C"),
                (ours[name][0], "generated (ours)"),
            ]
        ):
            ax = axes[r, col]
            ax.imshow(img, interpolation="nearest")
            ax.set_xticks([])
            ax.set_yticks([])
            if r == 0:
                ax.set_title(title, fontsize=7)
            if col == 0:
                ax.set_ylabel(name, fontsize=6, rotation=0, ha="right", va="center")
    fig.suptitle("severity-1 corruptions of CIFAR test image 0", fontsize=8)
    fig.tight_layout(rect=(0, 0, 1, 0.98))
    fig.savefig(path, dpi=160)
    plt.close(fig)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    real = load_real()
    bases = approx_clean_bases(real)
    ours = generate_ours(bases)
    report = compare(real, bases, ours)
    os.makedirs(os.path.join(repo, "plots"), exist_ok=True)
    sample_sheet(real, bases, ours, os.path.join(repo, "plots", "corruption_fidelity.png"))
    with open(os.path.join(repo, "CORRUPTION_FIDELITY.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"base_error_rms (jpeg-q80 approx clean): {report['base_error_rms']:.2f} LSB")
    for name, st in report.items():
        if not isinstance(st, dict):
            continue
        print(
            f"{name:20s} resid_std real {st['real']['resid_std']:6.2f} "
            f"(deconf {st['real']['resid_std_deconf']:6.2f}) ours "
            f"{st['ours']['resid_std']:6.2f} | hf real {st['real']['hf_ratio']:.2f} "
            f"ours {st['ours']['hf_ratio']:.2f} | mean_shift real "
            f"{st['real']['mean_shift']:+6.2f} ours {st['ours']['mean_shift']:+6.2f} "
            f"| psnr {st['psnr_ours_vs_real']:5.1f}"
        )


if __name__ == "__main__":
    main()
