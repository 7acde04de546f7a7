"""The attack/patch artifacts regenerate (round-5 L4 on-chip receipts).

Runs tools/attack_artifacts.py's pipeline end-to-end at smoke scale — real
reference images, the reference's pretrained ResNet-56, the fgsm/pgd
attack modules and the angelic-patch trainers — and asserts
RESULTS_ATTACKS.md / RESULTS_ATTACKS.json / the plot write correctly into
a temp repo. The committed artifacts at the repo root are the full-scale
run of the same code path (`python tools/attack_artifacts.py`), mirroring
the reference's printed outputs (attacks/fgsm.py:122,201-219,297-299;
pipenline/angellic.py:129-134).
"""

from __future__ import annotations

import json
import os

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


def test_attack_artifacts_regenerate(tmp_path):
    from tools import attack_artifacts as tool

    imgs = tool.load_dataset(limit=6)  # 12 images (2 views each)
    eps_grid = (2 / 255, 8 / 255)
    fgsm_rows, labels, attack_wall = tool.run_fgsm_sweep(imgs, eps_grid)
    assert len(fgsm_rows) == 2
    for r in fgsm_rows:
        assert 0.0 <= r["acc_adv"] <= 1.0 and 0.0 <= r["acc_reversed"] <= 1.0
    # FGSM at larger eps cannot flip FEWER images than the attack leaves
    # correct at a tiny one only by chance on 12 images — just check range
    min_eps = tool.run_minimal_eps(imgs, labels)
    assert 0.0 <= min_eps["frac_flipped_le_16"] <= 1.0
    if min_eps["frac_flipped_le_16"] > 0:
        assert 1.0 <= min_eps["median_eps_255"] <= 16.0

    pgd_res = tool.run_pgd(imgs, labels, steps=2)
    assert 0.0 <= pgd_res["acc_adv"] <= 1.0

    patch_res, patch_wall = tool.run_patches(
        imgs, labels, passes=1, restore_limit=4
    )
    for k in (
        "acc_corrupted", "acc_universal_patch",
        "acc_restorative_before", "acc_restorative_after",
    ):
        assert 0.0 <= patch_res[k] <= 1.0, (k, patch_res[k])
    assert patch_res["restorative_n"] == 4

    meta = {
        "dataset": "smoke",
        "images": int(imgs.shape[0]),
        "attack_wall_s": attack_wall,
        "patch_wall_s": patch_wall,
        "device": "test",
        "checkpoint": CKPT,
        "labels": "pseudo (clean-prediction agreement)",
    }
    paths = tool.write_artifacts(
        fgsm_rows, min_eps, pgd_res, patch_res, meta, repo=str(tmp_path)
    )
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0, p

    with open(os.path.join(tmp_path, "RESULTS_ATTACKS.json")) as f:
        data = json.load(f)
    assert len(data["fgsm"]) == 2 and "pgd" in data and "patches" in data

    md = open(os.path.join(tmp_path, "RESULTS_ATTACKS.md")).read()
    assert "FGSM accuracy vs epsilon" in md and "Angelic patches" in md
    assert "Minimal flipping epsilon" in md
