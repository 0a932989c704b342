"""gigagan_tpu — a TPU-native (JAX/XLA/Pallas) GigaGAN framework.

Re-implements the full capability surface of lucidrains/gigagan-pytorch
(arXiv 2303.05511) with a TPU-first architecture: channels-last feature maps,
MXU-friendly adaptive convolutions, jitted alternating train steps with
`lax.scan` gradient accumulation, R1 via grad-of-grad, bf16 compute, and
data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from gigagan_tpu import losses, ops, parallel, utils  # noqa: F401


def __getattr__(name):
    # Lazy heavyweight imports so `import gigagan_tpu` stays cheap.
    # NOTE: must use importlib, not `from gigagan_tpu import X` — a from-
    # import of a not-yet-loaded submodule calls hasattr(package, X), which
    # re-enters this __getattr__ and recurses forever (CPython
    # _handle_fromlist checks the attribute before importing the submodule).
    import importlib

    if name in ("Generator", "Discriminator", "StyleNetwork", "TextEncoder",
                "BaseGenerator", "Predictor", "SimpleDecoder"):
        models = importlib.import_module("gigagan_tpu.models")

        return getattr(models, name)
    if name == "UnetUpsampler":
        from gigagan_tpu.models.unet_upsampler import UnetUpsampler

        return UnetUpsampler
    if name == "VisionAidedDiscriminator":
        from gigagan_tpu.models.vision_aided import VisionAidedDiscriminator

        return VisionAidedDiscriminator
    if name == "OpenClipAdapter":
        from gigagan_tpu.models.clip import OpenClipAdapter

        return OpenClipAdapter
    if name == "GigaGAN":
        from gigagan_tpu.train import GigaGAN

        return GigaGAN
    if name == "AdaptiveConv2DMod":
        # reference-API alias for the rank-generic AdaptiveConv module
        from gigagan_tpu.models.layers import AdaptiveConv

        return AdaptiveConv
    if name in ("ImageDataset", "TextImageDataset", "MockTextImageDataset"):
        data = importlib.import_module("gigagan_tpu.data")

        return getattr(data, name)
    if name in ("QualityEvaluator", "frechet_distance", "clip_score"):
        ev = importlib.import_module("gigagan_tpu.eval")

        return getattr(ev, name)
    if name in ("models", "data", "train", "eval"):
        return importlib.import_module(f"gigagan_tpu.{name}")
    raise AttributeError(f"module 'gigagan_tpu' has no attribute {name!r}")


__all__ = [
    "GigaGAN",
    "OpenClipAdapter",
    "Generator",
    "Discriminator",
    "VisionAidedDiscriminator",
    "AdaptiveConv2DMod",
    "StyleNetwork",
    "TextEncoder",
    "UnetUpsampler",
    "ImageDataset",
    "TextImageDataset",
    "MockTextImageDataset",
    "QualityEvaluator",
    "losses",
    "ops",
    "parallel",
    "utils",
]
