from gigagan_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    MockImageDataset,
    MockTextImageDataset,
    TextImageDataset,
    collate_tensors_or_str,
)

__all__ = [
    "DataLoader",
    "ImageDataset",
    "MockImageDataset",
    "TextImageDataset",
    "MockTextImageDataset",
    "collate_tensors_or_str",
]
