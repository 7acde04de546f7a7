"""CLI entry point: ``python -m imagetransformations_tpu <command>``.

The reference ships ~100 standalone ``python <script>.py`` entry points with
hardcoded constants (SURVEY.md §5 'Config / flag system: none'). This CLI
exposes the equivalent workflows as subcommands over the typed configs in
``utils.config``:

- ``transform IN_DIR OUT_DIR``    — transformation.py __main__: the 8-type
  random-grid sweep over a folder, one fused dispatch per batch.
- ``chain IN_DIR OUT_DIR --ops blur:1.5,rotation:15,grayscale`` — apply a
  declarative op-chain (fused megakernel where it matches) to a folder.
- ``corrupt IN_DIR OUT_DIR``      — CIFAR-10-C-style store generation: every
  (image, corruption, severity) combination from the 19 on-device
  generators (``--corruptions=fog,frost --severities=1,3,5``).
- ``sweep``                       — FINAL_cifar_corrupted.py: corruption x
  severity x metric sweep (+AUROC plots). ``--data-root`` for real CIFAR-10;
  synthetic smoke data otherwise.
- ``report``                      — pipeline/cifar10_histogram4.py: all logit
  metrics + Youden thresholds + histogram PNGs.

Deeper research workflows (TENT, SWAG, refinement, attacks, evolution) live
in ``examples/run_*.py`` and ``workflows.py``.
"""

from __future__ import annotations

import os
import sys

#: default parameter key per op name, so ``blur:1.5`` parses without
#: spelling ``radius`` (full spellings like ``blur:radius=1.5`` also work)
_OP_PARAM = {
    "blur": "radius",
    "rotation": "angle",
    "brightness": "factor",
    "lighten_darken": "factor",
    "contrast": "alpha",
    "enhance_contrast": "factor",
    "enhance_color": "factor",
    "sharpness": "factor",
    "motion_blur": "ksize",
    "gaussian_noise": "std",
    "impulse_noise": "amount",
    "shot_noise": "lam",
    "translation": "tx",
    "zoom": "factor",
    "scale": "factor",
    "shear": "factor",
}
_NO_PARAM_OPS = {"grayscale", "invert", "histogram_equalization", "flip_vertical"}


def parse_ops(spec: str):
    """``"blur:1.5,rotation:15,grayscale"`` -> list[OpSpec]."""
    from imagetransformations_tpu.pipeline.chain import OpSpec

    chain = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, val = part.partition(":")
        if name in _NO_PARAM_OPS:
            chain.append(OpSpec(name))
            continue
        if name not in _OP_PARAM:
            raise SystemExit(
                f"unknown op {name!r}; known: "
                f"{sorted(_OP_PARAM) + sorted(_NO_PARAM_OPS)}"
            )
        if not val:
            raise SystemExit(f"op {name!r} needs a value, e.g. {name}:1.5")
        key, _, kv = val.partition("=")
        if kv:  # explicit param name: blur:radius=1.5
            chain.append(OpSpec(name, {key: float(kv)}))
        else:
            p = float(val)
            chain.append(
                OpSpec(name, {_OP_PARAM[name]: int(p) if name == "motion_blur" else p})
            )
    if not chain:
        raise SystemExit("--ops parsed to an empty chain")
    return chain


def _parse_size(argv) -> tuple[int, int] | None:
    for a in argv:
        if a.startswith("--size="):
            w, _, h = a.split("=", 1)[1].partition("x")
            return (int(w), int(h or w))
    return None


def _positional(argv, n: int, usage: str):
    pos = [a for a in argv if not a.startswith("--")]
    if len(pos) < n:
        raise SystemExit(f"usage: python -m imagetransformations_tpu {usage}")
    return pos


def _get_model_and_data(data_root: str):
    """Smoke model + data via the shared recipe (utils.demo)."""
    import jax.numpy as jnp

    from imagetransformations_tpu.utils.demo import get_data, get_model

    xtr, ytr, xte, yte = get_data(data_root, verbose=True)
    model_fn, to_model, *_ = get_model(xtr, ytr)
    return model_fn, to_model, jnp.asarray(xte), jnp.asarray(yte)


def cmd_transform(argv):
    import jax

    from imagetransformations_tpu.workflows import transform_folder

    in_dir, out_dir = _positional(argv, 2, "transform IN_DIR OUT_DIR [--size=WxH] [--seed=N]")[:2]
    seed = next((int(a.split("=", 1)[1]) for a in argv if a.startswith("--seed=")), 0)
    written = transform_folder(
        in_dir, out_dir, key=jax.random.key(seed), size=_parse_size(argv)
    )
    n = sum(len(v) for v in written.values())
    print(f"wrote {n} transformed images ({len(written)} transform types) to {out_dir}")


def cmd_chain(argv):
    import numpy as np
    import jax.numpy as jnp

    from imagetransformations_tpu.pipeline.chain import build_chain_fn
    from imagetransformations_tpu.pipeline.io import load_folder_images, save_batch_images

    spec = None
    argv = list(argv)
    for i, a in enumerate(argv):
        if a.startswith("--ops="):
            spec = a.split("=", 1)[1]
        elif a == "--ops" and i + 1 < len(argv):
            spec = argv[i + 1]
            argv[i + 1] = "--"  # consumed: don't parse the value as a positional
    argv = [a for a in argv if a != "--"]
    in_dir, out_dir = _positional(
        argv, 2,
        "chain IN_DIR OUT_DIR --ops OP:V,... [--size=WxH] [--strict-parity] [--fast-compile]",
    )[:2]
    if spec is None:
        raise SystemExit("chain requires --ops, e.g. --ops=blur:1.5,rotation:15,grayscale")
    strict = any(a == "--strict-parity" for a in argv)
    # one-shot CLI runs usually prefer the shared-across-angles executable
    # (one compile per shape+budget) over the last ~25% of steady-state
    # throughput (build_chain_fn docstring)
    fast_compile = any(a == "--fast-compile" for a in argv)
    chain = parse_ops(spec)
    imgs, paths = load_folder_images(in_dir, size=_parse_size(argv))
    if len(paths) == 0:
        raise SystemExit(f"no images found under {in_dir}")
    out = build_chain_fn(chain, strict_parity=strict, fast_compile=fast_compile)(
        jnp.asarray(imgs)
    )
    save_batch_images(np.asarray(out), paths, out_dir, "chained")
    print(f"applied {len(chain)} ops to {len(paths)} images -> {out_dir}")


def cmd_sweep(argv):
    import jax
    import jax.numpy as jnp

    from imagetransformations_tpu.evalx import corruption_sweep
    from imagetransformations_tpu.evalx.report import plot_severity_aucs, summary_table
    from imagetransformations_tpu.utils.config import SweepConfig

    cfg = SweepConfig.from_cli(argv)
    data_root = next(
        (a.split("=", 1)[1] for a in argv if a.startswith("--data-root=")), "./data"
    )
    model_fn, to_model, xte, yte = _get_model_and_data(data_root)
    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        from imagetransformations_tpu.pipeline.sharding import data_mesh

        mesh = data_mesh()
        print(f"data-parallel sweep over {mesh.shape['data']} devices")
    sweep = corruption_sweep(
        model_fn, to_model, xte, yte, jax.random.key(0),
        severities=tuple(range(1, cfg.severities + 1)),
        metric_names=tuple(cfg.metrics.split(",")),
        batch_size=cfg.batch_size,
        mesh=mesh,
    )
    print(summary_table(sweep).to_string(index=False))
    os.makedirs(cfg.out_dir, exist_ok=True)
    for m in cfg.metrics.split(","):
        plot_severity_aucs(sweep, m, os.path.join(cfg.out_dir, f"auc_{m}.png"))
    print(f"plots in {cfg.out_dir}")


def cmd_report(argv):
    from imagetransformations_tpu.utils.config import SweepConfig
    from imagetransformations_tpu.workflows import uncertainty_report

    cfg = SweepConfig.from_cli(argv)
    data_root = next(
        (a.split("=", 1)[1] for a in argv if a.startswith("--data-root=")), "./data"
    )
    model_fn, to_model, xte, yte = _get_model_and_data(data_root)
    res = uncertainty_report(model_fn, to_model, xte, yte, out_dir=cfg.out_dir)
    print(f"accuracy: {res['accuracy']:.4f}")
    for m, row in res["thresholds"].items():
        print(f"  {m:>18s}: auroc={row['auroc']:.4f} threshold={row['threshold']:.4f}")
    print(f"histograms in {cfg.out_dir}")


def cmd_corrupt(argv):
    """Generate a CIFAR-10-C-style corrupted store from a folder of images:
    one output image per (input, corruption, severity)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from imagetransformations_tpu.evalx.harness import (
        CORRUPTIONS, EXTRA_CORRUPTIONS, corrupt,
    )
    from imagetransformations_tpu.pipeline.io import load_folder_images

    in_dir, out_dir = _positional(
        argv, 2,
        "corrupt IN_DIR OUT_DIR [--corruptions=a,b] [--severities=1,3,5] [--size=WxH]",
    )[:2]
    #: the full 19-generator CIFAR-10-C store surface: the canonical 15
    #: plus the reference store's four extras (NOT rotation/translation,
    #: which are sweep-only extras)
    store_19 = list(CORRUPTIONS) + [
        "speckle_noise", "gaussian_blur", "spatter", "saturate",
    ]
    names = next(
        (a.split("=", 1)[1].split(",") for a in argv if a.startswith("--corruptions=")),
        store_19,
    )
    sevs = next(
        (
            [int(s) for s in a.split("=", 1)[1].split(",")]
            for a in argv
            if a.startswith("--severities=")
        ),
        [1, 2, 3, 4, 5],
    )
    known = set(CORRUPTIONS) | set(EXTRA_CORRUPTIONS)
    bad = [n for n in names if n not in known]
    if bad:
        raise SystemExit(f"unknown corruptions {bad}; known: {sorted(known)}")
    bad_sev = [s for s in sevs if not 1 <= s <= 5]
    if bad_sev:
        raise SystemExit(f"severities must be in 1..5, got {bad_sev}")
    imgs, paths = load_folder_images(in_dir, size=_parse_size(argv))
    if len(paths) == 0:
        raise SystemExit(f"no images found under {in_dir}")
    x = jnp.asarray(imgs)
    os.makedirs(out_dir, exist_ok=True)
    # unique per-input stems: walk is recursive, so two inputs may share a
    # basename (a/img.png, b/img.png) — derive stems from the in_dir-relative
    # path (separators -> '_') and suffix any remaining duplicates
    stems, seen = [], {}
    for p in paths:
        rel = os.path.relpath(p, in_dir)
        stem = os.path.splitext(rel)[0].replace(os.sep, "_")
        n = seen.get(stem, 0)
        seen[stem] = n + 1
        stems.append(stem if n == 0 else f"{stem}_{n}")
    key = jax.random.key(0)
    count = 0
    for name in names:
        for sev in sevs:
            key, k = jax.random.split(key)
            out = np.asarray(corrupt(x, name, sev, k))
            for i, stem in enumerate(stems):
                Image.fromarray(out[i]).save(
                    os.path.join(out_dir, f"{stem}_{name}_severity{sev}.png")
                )
                count += 1
    print(
        f"wrote {count} corrupted images ({len(names)} corruptions x "
        f"{len(sevs)} severities) to {out_dir}"
    )


_COMMANDS = {
    "transform": cmd_transform,
    "chain": cmd_chain,
    "corrupt": cmd_corrupt,
    "sweep": cmd_sweep,
    "report": cmd_report,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        raise SystemExit(0)
    cmd = argv[0]
    if cmd not in _COMMANDS:
        raise SystemExit(
            f"unknown command {cmd!r}; available: {', '.join(_COMMANDS)}"
        )
    _COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    main()
