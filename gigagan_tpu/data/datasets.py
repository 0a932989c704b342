"""Host-side data pipeline feeding numpy NHWC batches to the jitted steps.

Parity targets (gigagan_pytorch/data.py):
- ImageDataset (:48-89): recursive glob by extension, ≥100-image assert,
  Resize(short side) → optional horizontal flip → CenterCrop → [0,1] float
- TextImageDataset (:91-97): abstract, str-aware collation
- MockTextImageDataset (:99-113): random tensors + 'mock text'
- collate_tensors_or_str (:28-44)

TPU design: decode/resize runs on a host CPU thread pool (`num_workers`
decode threads under a background prefetch producer) while the previous
step executes on device; the trainer overlaps loading with device compute
by dispatching the step before blocking.  Images are channels-last float32
in [0, 1].  Multi-host: every process draws a DISJOINT per-epoch shard
(see DataLoader), the equivalent of the reference's per-rank
`accelerator.prepare(dl)` sharding (gigagan_pytorch.py:2161).
"""

from __future__ import annotations

import itertools
import random
import threading
from pathlib import Path
from queue import Queue
from typing import Optional, Sequence

import numpy as np

from gigagan_tpu.utils import exists

try:  # PIL ships with the baked torchvision
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def collate_tensors_or_str(data):
    """Stack arrays; collect strings into List[str]
    (reference: data.py:28-44)."""
    is_one_data = not isinstance(data[0], tuple)
    if is_one_data:
        return (np.stack(data),)

    outputs = []
    for datum in zip(*data):
        if isinstance(datum[0], str):
            outputs.append(list(datum))
        else:
            outputs.append(np.stack(datum))
    return tuple(outputs)


class DataLoader:
    """Epoch-shuffling, drop-last, background-prefetching loader with
    per-process sharding and threaded decode.

    Multi-host semantics match the reference's `accelerator.prepare(dl)`
    (gigagan_pytorch.py:2161): every process draws a DISJOINT shard of each
    epoch.  All processes build the same seeded permutation, then process
    `i` of `k` keeps `order[i::k]` (truncated to the common length so every
    host agrees on the number of batches).  `process_index/process_count`
    default to `jax.process_index()/jax.process_count()` resolved lazily at
    iteration time — pass them explicitly for testing.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        collate_fn=None,
        prefetch: int = 2,
        num_workers: int = 4,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or collate_tensors_or_str
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)

    def _process(self):
        if self.process_index is not None:
            return self.process_index, (self.process_count or 1)
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:  # pragma: no cover - jax always importable here
            return 0, 1

    def _local_len(self):
        _, pc = self._process()
        return len(self.dataset) // pc

    def __len__(self):
        n = self._local_len()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # identical permutation on every process (same seed, rngs
            # advance in lockstep) → the strided shards are disjoint
            self._rng.shuffle(order)
        pi, pc = self._process()
        if pc > 1:
            order = order[pi::pc][: n // pc]
        return order

    def _batches(self):
        order = self._epoch_indices()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            # Decode is pipelined ACROSS batches: up to (prefetch+1) batches'
            # worth of item futures are in flight at once, so the pool never
            # drains at batch boundaries (a per-batch pool.map barriers on
            # the slowest item and idles the other workers meanwhile).
            depth = (max(self.prefetch, 1) + 1) * self.batch_size
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending = []
                it = iter(range(0, stop, self.batch_size))

                def submit_next():
                    start = next(it, None)
                    if start is None:
                        return False
                    idx = order[start : start + self.batch_size]
                    pending.append(
                        [pool.submit(self.dataset.__getitem__, int(i))
                         for i in idx]
                    )
                    return True

                while len(pending) * self.batch_size < depth:
                    if not submit_next():
                        break
                while pending:
                    batch_futures = pending.pop(0)
                    items = [f.result() for f in batch_futures]
                    submit_next()
                    yield self.collate_fn(items)
            return
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.collate_fn([self.dataset[int(i)] for i in idx])

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return

        q: Queue = Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for item in self._batches():
                    q.put(item)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item


def _load_image(path, image_size: int, hflip: bool,
                convert_to: Optional[str], rng: random.Random,
                fast_jpeg: bool = True):
    img = Image.open(path)
    if fast_jpeg and img.format == "JPEG":
        # libjpeg DCT-scaled decode: decode directly to the smallest
        # DCT-scale ≥ the target short side (2-4× faster than full decode
        # + downscale; the remaining bilinear resize below lands on the
        # exact target).  The reference decodes full-size then resizes
        # (torchvision T.Resize, data.py:68-74) — draft mode is a
        # quality-equivalent TPU-host optimization, opt-out via
        # ImageDataset(fast_jpeg=False).
        img.draft("RGB", (image_size, image_size))
    if exists(convert_to) and img.mode != convert_to:
        img = img.convert(convert_to)
    elif img.mode != "RGB":
        img = img.convert("RGB")

    # Resize short side to image_size (torchvision T.Resize semantics)
    w, h = img.size
    short = min(w, h)
    scale = image_size / short
    img = img.resize(
        (max(round(w * scale), image_size), max(round(h * scale), image_size)),
        Image.BILINEAR,
    )
    if hflip and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)

    # center crop
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))

    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class ImageDataset:
    def __init__(
        self,
        folder,
        image_size: int,
        exts: Sequence[str] = ("jpg", "jpeg", "png", "tiff"),
        augment_horizontal_flip: bool = False,
        convert_image_to: Optional[str] = None,
        seed: int = 0,
        fast_jpeg: bool = True,
    ):
        assert Image is not None, "PIL is required for ImageDataset"
        self.folder = folder
        self.image_size = image_size
        self.paths = [
            p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")
        ]
        assert len(self.paths) > 0, "your folder contains no images"
        assert len(self.paths) > 100, (
            "you need at least 100 images, 10k for research paper, "
            "millions for miraculous results (try Laion-5B)"
        )
        self.augment_horizontal_flip = augment_horizontal_flip
        self.convert_image_to = convert_image_to
        self.seed = seed
        self.fast_jpeg = fast_jpeg
        self._counter = itertools.count()

    def get_dataloader(self, batch_size, **kwargs):
        kwargs.setdefault("shuffle", True)
        kwargs.setdefault("drop_last", True)
        return DataLoader(self, batch_size, **kwargs)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        # per-call RNG (seed, index, access#): thread-safe under the
        # loader's decode pool, varies across epochs like torchvision's
        # global-rng RandomHorizontalFlip
        # random.Random only seeds from scalars — mix (seed, index, call#)
        # into one int (hash() is salted per-process for str, stable for
        # ints/tuples of ints)
        rng = random.Random(hash((self.seed, index, next(self._counter))))
        return _load_image(
            self.paths[index], self.image_size,
            self.augment_horizontal_flip, self.convert_image_to, rng,
            fast_jpeg=self.fast_jpeg,
        )


class TextImageDataset:
    """Abstract text-image dataset: subclasses return (image_hwc, text)."""

    def __init__(self):
        raise NotImplementedError

    def get_dataloader(self, batch_size, **kwargs):
        return DataLoader(
            self, batch_size, collate_fn=collate_tensors_or_str, **kwargs
        )

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, index):  # pragma: no cover - abstract
        raise NotImplementedError


class MockImageDataset:
    """Unconditional counterpart of MockTextImageDataset — random image
    tensors only, for exercising the quickstart path without data."""

    def __init__(self, image_size: int, length: int = int(1e5),
                 channels: int = 3, seed: int = 0):
        self.image_size = image_size
        self.channels = channels
        self.length = length
        self.seed = seed

    def get_dataloader(self, batch_size, **kwargs):
        kwargs.setdefault("shuffle", True)
        kwargs.setdefault("drop_last", True)
        return DataLoader(self, batch_size, **kwargs)

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        # per-index RNG: thread-safe under the loader's decode pool
        rng = np.random.default_rng((self.seed, index))
        return rng.random(
            (self.image_size, self.image_size, self.channels)
        ).astype(np.float32)


class SyntheticShapesDataset:
    """Structured synthetic images (smooth two-color gradient background +
    a few solid rectangles/ellipses) — a LEARNABLE distribution, unlike the
    pure-noise mocks, for training-health runs without a real dataset on
    disk.  Pure noise drives the D's input gradients (and hence the
    logged R1 penalty) into the thousands because no generator can
    approach the data manifold; against these images the losses settle
    into the reference README's oracle ranges (README.md:151-166)."""

    def __init__(self, image_size: int, length: int = int(1e5),
                 channels: int = 3, seed: int = 0, max_shapes: int = 3):
        self.image_size = image_size
        self.channels = channels
        self.length = length
        self.seed = seed
        self.max_shapes = max_shapes

    def get_dataloader(self, batch_size, **kwargs):
        kwargs.setdefault("shuffle", True)
        kwargs.setdefault("drop_last", True)
        return DataLoader(self, batch_size, **kwargs)

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        rng = np.random.default_rng((self.seed, index))
        s, c = self.image_size, self.channels
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / max(s - 1, 1)
        # oriented two-color gradient background
        theta = rng.uniform(0, 2 * np.pi)
        t = (np.cos(theta) * xx + np.sin(theta) * yy + 1.0) / 2.0
        c0 = rng.random(c).astype(np.float32)
        c1 = rng.random(c).astype(np.float32)
        img = t[..., None] * c1 + (1.0 - t[..., None]) * c0
        for _ in range(rng.integers(1, self.max_shapes + 1)):
            color = rng.random(c).astype(np.float32)
            cx, cy = rng.uniform(0.15, 0.85, size=2)
            rx, ry = rng.uniform(0.08, 0.3, size=2)
            if rng.random() < 0.5:  # ellipse
                m = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1.0
            else:  # rectangle
                m = (np.abs(xx - cx) < rx) & (np.abs(yy - cy) < ry)
            img = np.where(m[..., None], color, img)
        return np.clip(img, 0.0, 1.0).astype(np.float32)


class MockTextImageDataset(TextImageDataset):
    def __init__(self, image_size: int, length: int = int(1e5),
                 channels: int = 3, seed: int = 0):
        self.image_size = image_size
        self.channels = channels
        self.length = length
        self.seed = seed

    def get_dataloader(self, batch_size, **kwargs):
        return DataLoader(
            self, batch_size, collate_fn=collate_tensors_or_str, **kwargs
        )

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        rng = np.random.default_rng((self.seed, index))
        img = rng.standard_normal(
            (self.image_size, self.image_size, self.channels)
        ).astype(np.float32)
        return img, "mock text"
