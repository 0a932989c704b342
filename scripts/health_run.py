"""Long training-health run on the real chip with committed curve + grid
receipts (VERDICT r4 item 5; supersedes the round-3 500-step run).

Quickstart config (README.md:47-92 parity: 256px G+D, amp, batch 8),
SyntheticShapesDataset (learnable structured images — see DESIGN.md on why
pure-noise mocks drive the logged R1 into the millions).  The run:

- logs the 10-loss line every 20 steps to a committed JSONL
  (receipts/health_r05/losses.jsonl) via the trainer's `log_hook`
- writes sample grids (raw + EMA) at every quarter milestone into
  receipts/health_r05/
- computes CLIP-FID (gigagan_tpu/eval.py; mock CLIP weights unless an
  asset is on disk — the receipt records which) between EMA samples and
  the real set at each milestone, appending to
  receipts/health_r05/clip_fid.jsonl
- asserts finiteness at the end

Health oracle (reference README.md:151-166): G/MSG/D/MSD ~0-10 (not
exploding into triple digits after 1k steps), GP and SSL trend toward 0.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/health_run.py [steps]
"""
import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import numpy as np

from gigagan_tpu.data import SyntheticShapesDataset
from gigagan_tpu.train import GigaGAN

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
MILESTONES = 4
EVAL_N = int(os.environ.get("HEALTH_EVAL_N", "64"))
RECEIPTS = REPO / "receipts" / os.environ.get("HEALTH_TAG", "health_r05")
RECEIPTS.mkdir(parents=True, exist_ok=True)

losses_path = RECEIPTS / "losses.jsonl"
fid_path = RECEIPTS / "clip_fid.jsonl"
losses_f = open(losses_path, "a", buffering=1)


def log_hook(record):
    losses_f.write(json.dumps(record) + "\n")


gan = GigaGAN(
    generator=dict(
        dim_capacity=8, style_network=dict(dim=64, depth=4), image_size=256,
        dim_max=512, num_skip_layers_excite=4, unconditional=True,
    ),
    discriminator=dict(
        dim_capacity=16, dim_max=512, image_size=256,
        num_skip_layers_excite=4, unconditional=True,
    ),
    amp=True,
    model_folder="/tmp/gigagan-health/models",
    results_folder=str(RECEIPTS),  # sample grids land in the receipts dir
    log_steps_every=20,
    save_and_sample_every=max(STEPS // MILESTONES, 1),
    early_save_thres_steps=0,
    seed=0,
    log_hook=log_hook,
)

ds = SyntheticShapesDataset(256, length=512, seed=7)
gan.set_dataloader(ds.get_dataloader(8))

# quality evaluator: real pretrained CLIP when an asset is on disk
# (GIGAGAN_CLIP_CKPT / assets/), random-init smoke otherwise
from gigagan_tpu.eval import QualityEvaluator  # noqa: E402
from gigagan_tpu.models.clip import OpenClipAdapter  # noqa: E402

sys.path.insert(0, str(REPO / "scripts"))
from eval_quality import find_clip_ckpt  # noqa: E402

clip = OpenClipAdapter(pretrained=find_clip_ckpt(None))
evaluator = QualityEvaluator(clip, batch_size=8)
reals = np.stack([np.asarray(ds[i]) for i in range(EVAL_N)], axis=0)


def eval_milestone():
    fakes = []
    for i in range(0, EVAL_N, 8):
        fakes.append(np.clip(
            gan.generate(batch_size=min(8, EVAL_N - i), seed=9000 + i),
            0.0, 1.0,
        ))
    rec = {"step": gan.steps - 1,
           **evaluator.clip_fid(reals, np.concatenate(fakes, axis=0))}
    with open(fid_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"# milestone step {rec['step']}: clip_fid={rec['clip_fid']:.3f} "
          f"(real_clip={rec['clip_is_real']})", flush=True)


chunk = max(STEPS // MILESTONES, 1)
done = 0
while done < STEPS:
    n = min(chunk, STEPS - done)
    gan.forward(steps=n, grad_accum_every=1)
    done += n
    eval_milestone()

# final health assertions
state = jax.device_get(gan.state)
finite = all(
    bool(np.isfinite(np.asarray(x, np.float32)).all())
    for x in jax.tree.leaves((state.g_params, state.d_params))
)
print(f"params finite after {gan.steps - 1} steps: {finite}")
assert finite
losses_f.close()
print("HEALTH RUN OK")
