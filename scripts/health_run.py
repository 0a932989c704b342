"""500-step training-health run on the real chip (VERDICT r2 item 5).

Quickstart config (README.md:47-92 parity: 256px G+D, amp), mock data,
logging the 10-loss line every 20 steps.  Healthy per the reference's loss
oracle (README.md:151-166): G/MSG/D/MSD hover ~0-10 (not exploding into
triple digits), GP and SSL trend down, no NaN/inf.  Usage:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/health_run.py [steps]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from gigagan_tpu.data import SyntheticShapesDataset
from gigagan_tpu.train import GigaGAN

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 500

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
    results_folder="/tmp/gigagan-health/results",
    log_steps_every=20,
    save_and_sample_every=STEPS,  # one grid at the end
    early_save_thres_steps=0,
    seed=0,
)

ds = SyntheticShapesDataset(256, length=512, seed=7)
gan.set_dataloader(ds.get_dataloader(8))
gan.forward(steps=STEPS, grad_accum_every=1)

# final health assertions
state = jax.device_get(gan.state)
finite = all(
    bool(np.isfinite(np.asarray(x, np.float32)).all())
    for x in jax.tree.leaves((state.g_params, state.d_params))
)
print(f"params finite after {gan.steps - 1} steps: {finite}")
assert finite
print("HEALTH RUN OK")
