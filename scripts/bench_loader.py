"""Real-JPEG input-pipeline throughput receipt (VERDICT r3 item 6).

Writes ~N real 512px JPEGs (synthetic-shapes content, quality 92 — typical
photo-corpus file sizes), then measures:
  1. single-image decode cost at 256px, draft-mode (fast_jpeg) vs full
     decode + resize;
  2. end-to-end DataLoader throughput (decode pool + cross-batch
     pipelining + prefetch) in images/sec on THIS host;
  3. the implied images/sec per decode worker, i.e. how many host cores a
     real deployment needs so the loader sustains >= 2x the train step's
     consumption (bench.py's img/s).

Prints one JSON line.  Usage: python scripts/bench_loader.py [n_images]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
from PIL import Image

from gigagan_tpu.data import ImageDataset
from gigagan_tpu.data.datasets import SyntheticShapesDataset, _load_image

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SRC = 512   # stored JPEG resolution
DST = 256   # train resolution
ROOT = pathlib.Path("/tmp/gigagan-loader-bench")


def make_corpus():
    ROOT.mkdir(parents=True, exist_ok=True)
    existing = list(ROOT.glob("*.jpg"))
    if len(existing) >= N:
        return
    ds = SyntheticShapesDataset(SRC, length=N, seed=7)
    for i in range(N):
        arr = (ds[i] * 255).astype(np.uint8)
        Image.fromarray(arr).save(ROOT / f"img-{i:05d}.jpg", quality=92)


def time_decode(fast: bool, n=64):
    import random

    paths = sorted(ROOT.glob("*.jpg"))[:n]
    rng = random.Random(0)
    t0 = time.perf_counter()
    for p in paths:
        _load_image(p, DST, False, None, rng, fast_jpeg=fast)
    return (time.perf_counter() - t0) / n


def loader_throughput(num_workers=4, batch=8):
    ds = ImageDataset(ROOT, DST, seed=0)
    dl = ds.get_dataloader(
        batch, num_workers=num_workers, prefetch=2, shuffle=True,
    )
    n_img = 0
    it = iter(dl)
    next(it)  # warm the pool/queue
    t0 = time.perf_counter()
    for b in it:
        n_img += b[0].shape[0]
    return n_img / (time.perf_counter() - t0)


def main():
    make_corpus()
    ms_fast = time_decode(True) * 1e3
    ms_full = time_decode(False) * 1e3
    tput = loader_throughput()
    result = {
        "metric": "loader_256px_jpeg_images_per_sec",
        "host_cores": __import__("os").cpu_count(),
        "decode_ms_fast_jpeg": round(ms_fast, 2),
        "decode_ms_full": round(ms_full, 2),
        "draft_speedup": round(ms_full / ms_fast, 2),
        "loader_images_per_sec": round(tput, 1),
        # decode dominates; throughput scales ~linearly with decode cores
        "projected_images_per_sec_8_cores": round(8e3 / ms_fast, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
