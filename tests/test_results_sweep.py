"""The full-severity sweep artifact regenerates (VERDICT r3 item 3).

Runs tools/full_severity_sweep.py's pipeline end-to-end at smoke scale —
real reference images, the reference's own pretrained ResNet-56
checkpoint, our generators, the corruption_sweep harness — and asserts
the RESULTS.md / RESULTS_SWEEP.json / plot artifacts write correctly
into a temp repo. The committed artifacts at the repo root are the
full-scale run of the same code path
(`python tools/full_severity_sweep.py`), mirroring the reference's
committed plots (attacks/uncertainty/plots_corrupted/,
FINAL_cifar_corrupted.py:116-168).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

CKPT = (
    "/root/reference/attacks/cifar10-unvertainty/swag/swag_checkpoints/"
    "cifar10_resnet56_pretrained.pt"
)
IMAGES = "/root/reference/imagenette2/transformed"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.isdir(IMAGES)),
    reason="reference checkpoint / images not mounted",
)


def test_sweep_artifacts_regenerate(tmp_path):
    from tools import full_severity_sweep as tool

    imgs = tool.load_dataset(limit=8)  # 16 images (2 views each)
    result, wall = tool.run_sweep(
        imgs, corruption_names=("gaussian_noise", "contrast"),
        severities=(1, 3),
    )
    # monotone-ish degradation sanity: severity 3 never *beats* severity 1
    # by more than noise on these corruptions
    for name in result:
        assert result[name][3]["accuracy"] <= result[name][1]["accuracy"] + 0.15

    meta = {
        "dataset": "smoke (8 reference JPEGs x 2 views @ 32x32)",
        "images_per_cell": int(imgs.shape[0]),
        "cells": 4,
        "wall_s": wall,
        "device": "test",
        "checkpoint": CKPT,
        "labels": "pseudo (clean-prediction agreement)",
    }
    paths = tool.write_artifacts(result, meta, repo=str(tmp_path))
    assert len(paths) == 4
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0, p

    with open(os.path.join(tmp_path, "RESULTS_SWEEP.json")) as f:
        data = json.load(f)
    assert data["meta"]["images_per_cell"] == imgs.shape[0]
    assert set(data["result"]) == {"gaussian_noise", "contrast"}
    # AUROCs are probabilities over >= 2 cells
    for name, cells in data["result"].items():
        for sev, cell in cells.items():
            for m, v in cell["auroc"].items():
                assert 0.0 <= v <= 1.0, (name, sev, m, v)

    # the two non-logit detector columns the reference computes inline
    # (VERDICT r4 item 7): present in every cell and in the report table
    for name, cells in data["result"].items():
        for sev, cell in cells.items():
            assert "odin" in cell["auroc"] and "mahalanobis" in cell["auroc"]

    md = open(os.path.join(tmp_path, "RESULTS.md")).read()
    assert "| gaussian_noise |" in md and "| shannon_entropy |" in md
    assert "| odin |" in md and "| mahalanobis |" in md
