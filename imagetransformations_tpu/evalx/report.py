"""Reporting: uncertainty histograms, AUC line plots, summary tables.

Parity map:
- pipeline/metrics/energy.py:48-90 (plot_and_threshold_uncertainty) and
  attacks/uncertainty/FINAL_cifar_corrupted.py:116-168
  (plot_uncertainty_vs_correct_counts) -> ``plot_uncertainty_histogram``:
  20-bin correct-vs-incorrect bar chart with threshold line, saved PNG.
- FINAL_cifar_corrupted severity AUC line plot -> ``plot_severity_aucs``.
- pipeline/cifar_iterative_mc.py:524-528 pandas table -> ``summary_table``.
"""

from __future__ import annotations

import numpy as np


def plot_uncertainty_histogram(
    scores, correct, threshold: float | None = None, n_bins: int = 20,
    title: str = "", out_path: str | None = None,
):
    """20-bin correct/incorrect histogram of an uncertainty score."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scores = np.asarray(scores)
    correct = np.asarray(correct).astype(bool)
    edges = np.linspace(scores.min(), scores.max() + 1e-9, n_bins + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    width = (edges[1] - edges[0]) * 0.4
    c_hist, _ = np.histogram(scores[correct], bins=edges)
    i_hist, _ = np.histogram(scores[~correct], bins=edges)
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.bar(centers - width / 2, c_hist, width=width, label="correct", color="#2a9d8f")
    ax.bar(centers + width / 2, i_hist, width=width, label="incorrect", color="#e76f51")
    if threshold is not None:
        ax.axvline(threshold, color="k", linestyle="--", label=f"threshold={threshold:.3g}")
    ax.set_xlabel("uncertainty")
    ax.set_ylabel("count")
    ax.set_title(title)
    ax.legend()
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def plot_severity_aucs(sweep_result: dict, metric: str, out_path: str | None = None):
    """AUROC vs severity, one line per corruption (FINAL_cifar_corrupted)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    for name, sev_map in sweep_result.items():
        sevs = sorted(sev_map)
        aucs = [sev_map[s]["auroc"][metric] for s in sevs]
        ax.plot(sevs, aucs, marker="o", label=name)
    ax.set_xlabel("severity")
    ax.set_ylabel(f"AUROC ({metric})")
    ax.set_ylim(0.0, 1.0)
    ax.legend(fontsize=7, ncol=2)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path
    return fig


def summary_table(sweep_result: dict):
    """Flatten a sweep into a pandas DataFrame (printable summary)."""
    import pandas as pd

    rows = []
    for name, sev_map in sweep_result.items():
        for sev, res in sev_map.items():
            row = {"corruption": name, "severity": sev, "accuracy": res["accuracy"]}
            row.update({f"auroc_{m}": v for m, v in res["auroc"].items()})
            rows.append(row)
    return pd.DataFrame(rows)
