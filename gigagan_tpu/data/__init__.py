from gigagan_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    MockImageDataset,
    MockTextImageDataset,
    SyntheticShapesDataset,
    TextImageDataset,
    collate_tensors_or_str,
)

__all__ = [
    "DataLoader",
    "ImageDataset",
    "MockImageDataset",
    "TextImageDataset",
    "MockTextImageDataset",
    "SyntheticShapesDataset",
    "collate_tensors_or_str",
]
