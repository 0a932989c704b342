"""Text-conditioned GigaGAN with CLIP conditioning, cross-attention,
vision-aided discriminator, matching-aware + contrastive losses — the full
conditional recipe (reference README "Text conditioned" usage + losses).

Your dataset must yield (image_hwc_float01, caption_str) pairs — subclass
`gigagan_tpu.data.TextImageDataset`; `MockTextImageDataset` is used here so
the script runs standalone.

Pretrained CLIP: pass --clip-checkpoint (an open_clip torch .pt/.bin) and
--bpe-path (bpe_simple_vocab_16e6.txt.gz).  Without them the adapter uses
random CLIP weights + a deterministic fallback tokenizer (fine for pipeline
smoke tests, NOT for real training).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--clip-checkpoint", default=None)
    ap.add_argument("--bpe-path", default=None)
    args = ap.parse_args()

    from gigagan_tpu import GigaGAN, MockTextImageDataset, OpenClipAdapter

    clip = OpenClipAdapter(
        pretrained=args.clip_checkpoint, bpe_path=args.bpe_path
    )

    text_encoder = dict(dim=512, depth=4, clip_dim=clip.dim_latent)

    gan = GigaGAN(
        generator=dict(
            dim_capacity=8,
            style_network=dict(dim=512, depth=4, dim_text_latent=512),
            text_encoder=text_encoder,
            image_size=args.image_size,
            dim_max=512,
            num_skip_layers_excite=4,
            unconditional=False,
        ),
        discriminator=dict(
            dim_capacity=16,
            dim_max=512,
            image_size=args.image_size,
            num_skip_layers_excite=4,
            unconditional=False,
            text_encoder=text_encoder,
        ),
        vision_aided_discriminator=dict(
            layer_indices=(-1, -2, -3),
            conv_dim=512,
            unconditional=False,
        ),
        clip=clip,
        amp=True,
    )

    dataset = MockTextImageDataset(args.image_size, length=10_000)
    gan.set_dataloader(dataset.get_dataloader(batch_size=args.batch_size))

    gan(steps=args.steps, grad_accum_every=1)

    images = gan.generate(
        batch_size=2,
        texts=["a cherry blossom tree", "a red sports car"],
    )
    print("generated:", images.shape)


if __name__ == "__main__":
    main()
