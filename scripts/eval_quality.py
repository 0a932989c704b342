"""FID-substitute quality evaluation: CLIP-FID (+ CLIP-score when
conditional) for a trained GigaGAN checkpoint — VERDICT r4 item 8.

Generates `--n` EMA samples from a quickstart-shaped model (optionally
restored from `--ckpt`), embeds them and `--n` real images with the CLIP
adapter, and prints one JSON line with the Fréchet distance in CLIP
embedding space (gigagan_tpu/eval.py).

Real-metric activation: pass `--clip /path/to/vit_b_32-laion400m_e32.pt`
(or set GIGAGAN_CLIP_CKPT, or drop the file at assets/) and the numbers
become true pretrained-feature CLIP-FID; without an asset the run still
completes on random-init CLIP weights and the output carries
`"clip_is_real": false` + the mock reasons.

Usage:
  python scripts/eval_quality.py [--ckpt model.ckpt] [--data shapes|DIR]
      [--n 256] [--image-size 256] [--clip CLIP_CKPT] [--batch 8]
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

DEFAULT_CLIP_ASSET = pathlib.Path(__file__).resolve().parents[1] / \
    "assets" / "vit_b_32-laion400m_e32.pt"


def find_clip_ckpt(arg):
    if arg:
        return arg
    env = os.environ.get("GIGAGAN_CLIP_CKPT")
    if env:
        return env
    if DEFAULT_CLIP_ASSET.exists():
        return str(DEFAULT_CLIP_ASSET)
    return None


def real_images(source, n, image_size):
    if source == "shapes":
        from gigagan_tpu.data import SyntheticShapesDataset

        ds = SyntheticShapesDataset(image_size, length=n, seed=123)
    else:
        from gigagan_tpu.data import ImageDataset

        ds = ImageDataset(source, image_size)
    rows = [np.asarray(ds[i % len(ds)], np.float32) for i in range(n)]
    return np.stack(rows, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="trainer checkpoint to evaluate (default: fresh "
                         "random weights — smoke mode)")
    ap.add_argument("--data", default="shapes",
                    help="'shapes' or an image folder for the real set")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--clip", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    from gigagan_tpu.eval import QualityEvaluator
    from gigagan_tpu.models.clip import OpenClipAdapter
    from gigagan_tpu.train import GigaGAN

    gan = GigaGAN(
        generator=dict(
            dim_capacity=8, style_network=dict(dim=64, depth=4),
            image_size=args.image_size, dim_max=512,
            num_skip_layers_excite=4, unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16, dim_max=512, image_size=args.image_size,
            num_skip_layers_excite=4, unconditional=True,
        ),
        amp=True,
        model_folder="/tmp/gigagan-eval/models",
        results_folder="/tmp/gigagan-eval/results",
        log_steps_every=10 ** 9, save_and_sample_every=10 ** 9,
        early_save_thres_steps=0, seed=0,
    )
    if args.ckpt:
        gan.load(args.ckpt)

    clip_path = find_clip_ckpt(args.clip)
    clip = OpenClipAdapter(pretrained=clip_path)
    ev = QualityEvaluator(clip, batch_size=max(args.batch, 8))

    fakes = []
    for i in range(0, args.n, args.batch):
        b = min(args.batch, args.n - i)
        fakes.append(np.clip(
            gan.generate(batch_size=b, seed=1000 + i), 0.0, 1.0))
    fakes = np.concatenate(fakes, axis=0)
    reals = real_images(args.data, args.n, args.image_size)

    result = {
        "metric": "clip_fid",
        "steps_trained": gan.steps,
        **ev.clip_fid(reals, fakes),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
