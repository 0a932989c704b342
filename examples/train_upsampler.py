"""Unconditional 64→256 UNet upsampler — the reference README's second
quickstart (README.md:95-148) on TPU.

Run:  python examples/train_upsampler.py --data /path/to/images
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--input-image-size", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from gigagan_tpu import GigaGAN, ImageDataset

    gan = GigaGAN(
        train_upsampler=True,
        generator=dict(
            style_network=dict(dim=64, depth=4),
            dim=32,
            image_size=args.image_size,
            input_image_size=args.input_image_size,
            unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16,
            dim_max=512,
            image_size=args.image_size,
            num_skip_layers_excite=4,
            multiscale_input_resolutions=(128,),
            unconditional=True,
        ),
        amp=True,
    )

    dataset = ImageDataset(folder=args.data, image_size=args.image_size)
    gan.set_dataloader(dataset.get_dataloader(batch_size=args.batch_size))

    gan(steps=args.steps, grad_accum_every=1)

    lowres = np.random.rand(
        1, args.input_image_size, args.input_image_size, 3
    ).astype(np.float32)
    images = gan.generate(lowres)  # (1, image_size, image_size, 3)
    print("upsampled:", images.shape)


if __name__ == "__main__":
    main()
