"""Host data pipeline tests: per-process sharding (the reference's
per-rank `accelerator.prepare(dl)` semantics, gigagan_pytorch.py:2161),
threaded decode determinism, and collation."""

import numpy as np

from gigagan_tpu.data import (
    DataLoader,
    MockImageDataset,
    MockTextImageDataset,
    collate_tensors_or_str,
)


class IndexDataset:
    """Each item is its own index — makes shard membership assertable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2, 1), float(i), np.float32)


def drawn_indices(loader, epochs=1):
    out = set()
    for _ in range(epochs):
        for (batch,) in loader:
            out.update(int(v) for v in batch[:, 0, 0, 0])
    return out


class TestPerProcessSharding:
    def test_two_processes_draw_disjoint_shards(self):
        """N mocked hosts must train on DISJOINT data, not N copies
        (multi-host parity with the reference's sharded loader)."""
        ds = IndexDataset(64)
        loaders = [
            DataLoader(
                ds, 4, seed=123, prefetch=0, num_workers=1,
                process_index=i, process_count=2,
            )
            for i in range(2)
        ]
        seen = [drawn_indices(ld) for ld in loaders]
        assert len(seen[0]) == 32 and len(seen[1]) == 32
        assert seen[0].isdisjoint(seen[1])
        assert seen[0] | seen[1] == set(range(64))

    def test_processes_agree_on_batch_count(self):
        ds = IndexDataset(67)  # not divisible by 2 — truncate to agree
        lens = [
            len(DataLoader(ds, 4, process_index=i, process_count=2))
            for i in range(2)
        ]
        assert lens[0] == lens[1] == (67 // 2) // 4

    def test_epochs_reshuffle_but_stay_disjoint(self):
        ds = IndexDataset(32)
        loaders = [
            DataLoader(
                ds, 4, seed=7, prefetch=0, num_workers=1,
                process_index=i, process_count=2,
            )
            for i in range(2)
        ]
        for _ in range(3):  # every epoch re-permutes in lockstep
            a = drawn_indices(loaders[0])
            b = drawn_indices(loaders[1])
            assert a.isdisjoint(b) and len(a | b) == 32

    def test_single_process_default_covers_everything(self):
        ds = IndexDataset(16)
        ld = DataLoader(ds, 4, seed=0, prefetch=0, num_workers=1)
        assert drawn_indices(ld) == set(range(16))


class TestThreadedDecode:
    def test_worker_pool_matches_serial(self):
        """Thread-pool decode must yield the same batches in the same
        order as the serial path (pool.map preserves order; per-index
        dataset RNG is thread-safe)."""
        kwargs = dict(shuffle=True, drop_last=True, prefetch=0, seed=5)
        serial = DataLoader(
            MockImageDataset(8, length=40, seed=1), 4,
            num_workers=1, **kwargs,
        )
        pooled = DataLoader(
            MockImageDataset(8, length=40, seed=1), 4,
            num_workers=4, **kwargs,
        )
        for (a,), (b,) in zip(serial, pooled):
            np.testing.assert_array_equal(a, b)

    def test_image_dataset_decodes_real_jpegs(self, tmp_path):
        """End-to-end ImageDataset: real JPEGs on disk → decode (draft and
        full paths) → resize/crop → batched floats in [0, 1].  Regression:
        __getitem__ used a tuple seed for random.Random and crashed on
        every real-image access (round 4)."""
        from PIL import Image

        from gigagan_tpu.data import ImageDataset

        rng = np.random.default_rng(0)
        for i in range(101):
            arr = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"im{i:03d}.jpg")
        for fast in (True, False):
            ds = ImageDataset(
                tmp_path, 64, augment_horizontal_flip=True, seed=0,
                fast_jpeg=fast,
            )
            item = ds[0]
            assert item.shape == (64, 64, 3)
            assert item.dtype == np.float32
            assert 0.0 <= item.min() and item.max() <= 1.0
        dl = ImageDataset(tmp_path, 64, seed=0).get_dataloader(
            4, num_workers=2, prefetch=1,
        )
        (batch,) = next(iter(dl))
        assert batch.shape == (4, 64, 64, 3)

    def test_mock_text_dataset_deterministic_per_index(self):
        ds = MockTextImageDataset(8, length=10, seed=3)
        img1, txt1 = ds[4]
        img2, txt2 = ds[4]
        np.testing.assert_array_equal(img1, img2)
        assert txt1 == txt2 == "mock text"


class TestCollation:
    def test_strings_become_list(self):
        items = [(np.zeros((2, 2)), "a"), (np.ones((2, 2)), "b")]
        imgs, texts = collate_tensors_or_str(items)
        assert imgs.shape == (2, 2, 2)
        assert texts == ["a", "b"]

    def test_bare_arrays_stack(self):
        (imgs,) = collate_tensors_or_str([np.zeros((2, 2)), np.ones((2, 2))])
        assert imgs.shape == (2, 2, 2)
