"""Command-line interface: train / train-upsampler / generate / upsample.

The reference leaves "port over CLI" as an unfinished TODO
(reference README.md:227); this module provides one.  Design:

- Every subcommand accepts ``--config cfg.json`` — a JSON object of
  ``GigaGAN(...)`` keyword arguments (nested dicts promote to modules via
  the same dict-promotion idiom as the Python API, trainer._promote).
  Command-line flags override the corresponding config entries.
- ``train`` writes the RESOLVED trainer config to
  ``<model_folder>/config.json`` so that ``generate`` / ``upsample`` can
  rebuild the exact model from the model folder alone — no need to
  re-specify architecture flags at sampling time.
- ``--mock-data`` swaps the image folder for the mock dataset
  (reference data.py:94-113), so every pipeline can be smoke-run with
  zero assets.

Usage examples::

    python -m gigagan_tpu train --data ./images --steps 10000 \
        --batch-size 8 --grad-accum 4
    python -m gigagan_tpu train --config recipe.json --steps 1000
    python -m gigagan_tpu train-upsampler --data ./images \
        --input-size 64 --image-size 256 --steps 10000
    python -m gigagan_tpu generate --models ./gigagan-models \
        --num 16 --out samples.png
    python -m gigagan_tpu upsample --models ./up-models \
        --input low.png --out high.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

CONFIG_NAME = "config.json"


# --------------------------------------------------------------- helpers


def _deep_update(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def _load_config(path) -> dict:
    with open(path) as f:
        cfg = json.load(f)
    assert isinstance(cfg, dict), f"{path} must hold a JSON object"
    return cfg


def _default_train_config(args) -> dict:
    """The reference README quickstart shapes (README.md:39-92), sized by
    the CLI flags."""
    if args.cmd == "train-upsampler":
        generator = dict(
            style_network=dict(dim=64, depth=4),
            dim=32,
            image_size=args.image_size,
            input_image_size=args.input_size,
            unconditional=True,
        )
        discriminator = dict(
            dim_capacity=16,
            dim_max=512,
            image_size=args.image_size,
            num_skip_layers_excite=4,
            multiscale_input_resolutions=(args.image_size // 2,),
            unconditional=True,
        )
    else:
        generator = dict(
            dim_capacity=8,
            style_network=dict(dim=64, depth=4),
            image_size=args.image_size,
            dim_max=512,
            num_skip_layers_excite=4,
            unconditional=True,
        )
        discriminator = dict(
            dim_capacity=16,
            dim_max=512,
            image_size=args.image_size,
            num_skip_layers_excite=4,
            unconditional=True,
        )
    return dict(
        generator=generator,
        discriminator=discriminator,
        amp=True,
        train_upsampler=args.cmd == "train-upsampler",
    )


def _resolve_train_config(args) -> dict:
    cfg = _default_train_config(args)
    if args.config:
        cfg = _deep_update(cfg, _load_config(args.config))
    # flag overrides (only when explicitly provided)
    overrides = {}
    if args.models:
        overrides["model_folder"] = args.models
    if args.results:
        overrides["results_folder"] = args.results
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.save_every is not None:
        overrides["save_and_sample_every"] = args.save_every
    if args.no_amp:
        overrides["amp"] = False
    if args.cmd == "train-upsampler":
        overrides["train_upsampler"] = True
    return _deep_update(cfg, overrides)


def _build_gan(cfg: dict):
    from gigagan_tpu.train import GigaGAN

    return GigaGAN(**cfg)


def _make_dataset(args, image_size: int):
    if args.mock_data:
        from gigagan_tpu.data import MockImageDataset

        return MockImageDataset(image_size, seed=0)
    assert args.data, "--data FOLDER is required (or pass --mock-data)"
    from gigagan_tpu.data import ImageDataset

    return ImageDataset(
        args.data, image_size,
        augment_horizontal_flip=args.hflip,
    )


def _load_model_folder(models: str):
    """Rebuild a trainer from <models>/config.json + latest checkpoint."""
    folder = Path(models)
    cfg_path = folder / CONFIG_NAME
    assert cfg_path.exists(), (
        f"{cfg_path} not found — `train` writes it; for external "
        "checkpoints pass --config with the GigaGAN kwargs"
    )
    cfg = _load_config(cfg_path)
    cfg["model_folder"] = str(folder)
    gan = _build_gan(cfg)
    ckpts = sorted(
        folder.glob("model-*.ckpt"),
        key=lambda p: int(p.stem.split("-")[-1]),
    )
    assert ckpts, f"no model-*.ckpt under {folder}"
    gan.load(ckpts[-1])
    return gan, ckpts[-1]


# ------------------------------------------------------------ subcommands


def _cmd_train(args):
    assert args.mock_data or args.data, (
        "--data FOLDER is required (or pass --mock-data)"
    )
    cfg = _resolve_train_config(args)
    gan = _build_gan(cfg)

    # persist the resolved config so generate/upsample can rebuild the
    # model from the folder alone (tuples arrive back as lists; the
    # dict-promotion constructors accept both)
    gan.model_folder.mkdir(parents=True, exist_ok=True)
    with open(gan.model_folder / CONFIG_NAME, "w") as f:
        json.dump(cfg, f, indent=2, default=list)

    if args.resume:
        path = args.resume
        if path == "auto":
            ckpts = sorted(
                gan.model_folder.glob("model-*.ckpt"),
                key=lambda p: int(p.stem.split("-")[-1]),
            )
            path = ckpts[-1] if ckpts else None
        if path is not None:
            gan.print(f"[gigagan_tpu] resuming from {path}")
            gan.load(path)

    # the dataset always yields FULL-resolution images; the upsampler's
    # train step derives the lowres input itself (trainer parity with
    # examples/train_upsampler.py and reference :2210)
    ds = _make_dataset(args, gan.G.image_size)
    gan.set_dataloader(ds.get_dataloader(args.batch_size))
    gan(steps=args.steps, grad_accum_every=args.grad_accum)
    return 0


def _cmd_generate(args):
    import numpy as np

    gan, ckpt = _load_model_folder(args.models)
    assert not gan.train_upsampler, (
        "this model folder holds an upsampler — use `upsample`"
    )
    from gigagan_tpu.train.trainer import save_image_grid

    images = gan.generate(
        batch_size=args.num, seed=args.seed, use_ema=not args.no_ema
    )
    out = args.out or "samples.png"
    save_image_grid(
        np.clip(images, 0.0, 1.0), out,
        nrow=max(1, int(args.num ** 0.5)),
    )
    print(f"[gigagan_tpu] wrote {args.num} samples from {ckpt} -> {out}")
    return 0


def _cmd_evaluate(args):
    """CLIP-FID (+ optional grid) for a trained model folder — the
    FID-substitute quality metric (gigagan_tpu/eval.py; the reference's
    FID TODO is unchecked, its README.md:270).  Real pretrained-feature
    numbers when a CLIP checkpoint asset is available (--clip /
    GIGAGAN_CLIP_CKPT / assets/); otherwise runs on random-init CLIP and
    the output says so via clip_is_real/mock_reasons."""
    import numpy as np

    gan, ckpt = _load_model_folder(args.models)
    assert not gan.train_upsampler, (
        "evaluate samples the base generator; upsampler evaluation needs "
        "a lowres source — use `upsample` + your own metric loop"
    )
    from gigagan_tpu.eval import QualityEvaluator
    from gigagan_tpu.models.clip import OpenClipAdapter

    clip_path = args.clip or os.environ.get("GIGAGAN_CLIP_CKPT")
    if not clip_path:
        default_asset = Path("assets/vit_b_32-laion400m_e32.pt")
        clip_path = str(default_asset) if default_asset.exists() else None
    ev = QualityEvaluator(OpenClipAdapter(pretrained=clip_path),
                          batch_size=max(args.batch, 8))

    ds = _make_dataset(args, gan.G.image_size)
    reals = np.stack(
        [np.asarray(ds[i % len(ds)], np.float32) for i in range(args.num)]
    )
    fakes = []
    for i in range(0, args.num, args.batch):
        b = min(args.batch, args.num - i)
        fakes.append(np.clip(
            gan.generate(batch_size=b, seed=(args.seed or 0) + i,
                         use_ema=not args.no_ema),
            0.0, 1.0,
        ))
    result = {
        "metric": "clip_fid",
        "checkpoint": str(ckpt),
        "steps_trained": int(gan.steps),
        **ev.clip_fid(reals, np.concatenate(fakes)),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")
    return 0


def _cmd_upsample(args):
    import numpy as np

    gan, ckpt = _load_model_folder(args.models)
    assert gan.train_upsampler, (
        "this model folder holds a base generator — use `generate`"
    )
    from PIL import Image

    from gigagan_tpu import ops

    img = Image.open(args.input).convert("RGB")
    lowres = np.asarray(img, np.float32)[None] / 255.0
    size = gan.G.input_image_size
    if lowres.shape[1] != size or lowres.shape[2] != size:
        lowres = np.asarray(
            ops.resize_image_to(lowres, size, "bilinear"), np.float32
        )
    out = gan.generate(lowres, seed=args.seed, use_ema=not args.no_ema)
    arr = (np.clip(out[0], 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(args.out)  # bare image, no grid padding
    print(
        f"[gigagan_tpu] upsampled {args.input} "
        f"({size} -> {out.shape[1]}) via {ckpt} -> {args.out}"
    )
    return 0


# ----------------------------------------------------------------- parser


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gigagan_tpu",
        description="TPU-native GigaGAN: train, sample, upsample.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_train(name, help_):
        t = sub.add_parser(name, help=help_)
        t.add_argument("--config", help="JSON file of GigaGAN kwargs")
        t.add_argument("--data", help="image folder")
        t.add_argument("--mock-data", action="store_true",
                       help="use the mock dataset (smoke runs)")
        t.add_argument("--hflip", action="store_true",
                       help="random horizontal flip augmentation")
        t.add_argument("--image-size", type=int, default=256)
        t.add_argument("--batch-size", type=int, default=8)
        t.add_argument("--grad-accum", type=int, default=1)
        t.add_argument("--steps", type=int, default=1000)
        t.add_argument("--lr", type=float, default=None)
        t.add_argument("--seed", type=int, default=None)
        t.add_argument("--save-every", type=int, default=None)
        t.add_argument("--no-amp", action="store_true",
                       help="full fp32 compute (default is bf16 amp)")
        t.add_argument("--models", default=None,
                       help="checkpoint folder (default ./gigagan-models)")
        t.add_argument("--results", default=None,
                       help="samples folder (default ./gigagan-results)")
        t.add_argument("--resume", nargs="?", const="auto", default=None,
                       help="resume from a checkpoint path, or the "
                            "latest in the model folder when bare")
        t.set_defaults(fn=_cmd_train)
        return t

    add_train("train", "train the base text/unconditional generator + D")
    t = add_train("train-upsampler", "train the UNet super-res upsampler")
    t.add_argument("--input-size", type=int, default=64,
                   help="lowres input resolution (default 64)")

    g = sub.add_parser("generate", help="sample a grid from a checkpoint")
    g.add_argument("--models", required=True,
                   help="model folder written by `train`")
    g.add_argument("--num", type=int, default=16)
    g.add_argument("--seed", type=int, default=None)
    g.add_argument("--no-ema", action="store_true",
                   help="sample the raw generator instead of EMA")
    g.add_argument("--out", default="samples.png")
    g.set_defaults(fn=_cmd_generate)

    e = sub.add_parser(
        "evaluate",
        help="CLIP-FID of EMA samples vs a real set (FID substitute)",
    )
    e.add_argument("--models", required=True,
                   help="model folder written by `train`")
    e.add_argument("--data", help="real-image folder")
    e.add_argument("--mock-data", action="store_true",
                   help="synthetic real set (smoke runs)")
    e.add_argument("--hflip", action="store_true", help=argparse.SUPPRESS)
    e.add_argument("--num", type=int, default=256,
                   help="samples per side of the Frechet fit")
    e.add_argument("--batch", type=int, default=8)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--no-ema", action="store_true")
    e.add_argument("--clip", default=None,
                   help="CLIP torch checkpoint for real-feature metrics")
    e.add_argument("--out", default=None, help="also write the JSON here")
    e.set_defaults(fn=_cmd_evaluate)

    u = sub.add_parser("upsample", help="super-resolve an image file")
    u.add_argument("--models", required=True)
    u.add_argument("--input", required=True, help="lowres image file")
    u.add_argument("--seed", type=int, default=None)
    u.add_argument("--no-ema", action="store_true")
    u.add_argument("--out", default="upsampled.png")
    u.set_defaults(fn=_cmd_upsample)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
