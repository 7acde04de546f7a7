"""CLI smoke + parser tests (``python -m imagetransformations_tpu``).

The CLI replaces the reference's ~100 hardcoded standalone scripts
(SURVEY.md §5 'Config / flag system: none'); two review rounds fixed
bugs here (corrupt names/defaults, chain --ops consumption), so the
surface is pinned by tests: parse_ops semantics, and the chain/corrupt
commands end to end on a tmp folder.
"""

import os

import numpy as np
import pytest
from PIL import Image

from imagetransformations_tpu.__main__ import main, parse_ops


def test_parse_ops_default_and_explicit_keys():
    chain = parse_ops("blur:1.5,rotation:15,grayscale,blur:radius=2.5")
    assert [c.name for c in chain] == ["blur", "rotation", "grayscale", "blur"]
    assert chain[0].params == {"radius": 1.5}
    assert chain[1].params == {"angle": 15.0}
    assert chain[2].params in ({}, None) or not chain[2].params
    assert chain[3].params == {"radius": 2.5}


def test_parse_ops_motion_blur_int_and_errors():
    (op,) = parse_ops("motion_blur:7")
    assert op.params == {"ksize": 7} and isinstance(op.params["ksize"], int)
    with pytest.raises(SystemExit, match="unknown op"):
        parse_ops("sepia:1.0")
    with pytest.raises(SystemExit, match="needs a value"):
        parse_ops("blur")
    with pytest.raises(SystemExit, match="empty chain"):
        parse_ops(" , ")


def _write_images(d, n=2, size=(40, 32)):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
        ).save(os.path.join(d, f"im{i}.png"))


def test_cli_chain_end_to_end(tmp_path, capsys):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_images(in_dir)
    main(["chain", in_dir, out_dir, "--ops=blur:1.0,grayscale"])
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 2 and all("chained" in f for f in outs)
    # grayscale output: all three channels equal
    arr = np.asarray(Image.open(os.path.join(out_dir, outs[0])).convert("RGB"))
    assert np.array_equal(arr[..., 0], arr[..., 1])
    assert "applied 2 ops to 2 images" in capsys.readouterr().out


def test_cli_chain_requires_ops_and_images(tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_images(in_dir)
    with pytest.raises(SystemExit, match="requires --ops"):
        main(["chain", in_dir, out_dir])
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(SystemExit, match="no images found"):
        main(["chain", empty, out_dir, "--ops=blur:1.0"])


def test_cli_corrupt_subset(tmp_path, capsys):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "c")
    _write_images(in_dir, n=2, size=(32, 32))
    main([
        "corrupt", in_dir, out_dir,
        "--corruptions=gaussian_noise,brightness", "--severities=1,5",
    ])
    outs = sorted(os.listdir(out_dir))
    # 2 images x 2 corruptions x 2 severities
    assert len(outs) == 8
    assert "im0_gaussian_noise_severity1.png" in outs
    assert "im1_brightness_severity5.png" in outs
    assert "wrote 8 corrupted images" in capsys.readouterr().out


def test_cli_corrupt_validates_args(tmp_path):
    in_dir = str(tmp_path / "in")
    _write_images(in_dir, n=1, size=(32, 32))
    with pytest.raises(SystemExit, match="unknown corruptions"):
        main(["corrupt", in_dir, str(tmp_path / "o"), "--corruptions=rain"])
    with pytest.raises(SystemExit, match="severities must be"):
        main(["corrupt", in_dir, str(tmp_path / "o"), "--severities=0,6"])


def test_cli_unknown_command_and_help(capsys):
    with pytest.raises(SystemExit, match="unknown command"):
        main(["frobnicate"])
    with pytest.raises(SystemExit):
        main(["--help"])
    assert "transform IN_DIR OUT_DIR" in capsys.readouterr().out
