"""Unconditional 256px GigaGAN — the reference README quickstart
(README.md:39-92) on TPU.

Run:  python examples/train_unconditional.py --data /path/to/images
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="image folder")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--results", default="./gigagan-results")
    ap.add_argument("--models", default="./gigagan-models")
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    from gigagan_tpu import GigaGAN, ImageDataset

    gan = GigaGAN(
        generator=dict(
            dim_capacity=8,
            style_network=dict(dim=64, depth=4),
            image_size=args.image_size,
            dim_max=512,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16,
            dim_max=512,
            image_size=args.image_size,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        amp=True,
        results_folder=args.results,
        model_folder=args.models,
    )

    if args.resume:
        gan.load(args.resume)

    dataset = ImageDataset(folder=args.data, image_size=args.image_size)
    gan.set_dataloader(dataset.get_dataloader(batch_size=args.batch_size))

    gan(steps=args.steps, grad_accum_every=args.grad_accum)

    images = gan.generate(batch_size=4)  # (4, H, W, 3) in [0, 1]
    print("sampled:", images.shape)


if __name__ == "__main__":
    main()
