"""Minimal repro of the trainer d/g steps at a given batch on TPU."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from gigagan_tpu.data import MockImageDataset
from gigagan_tpu.train import GigaGAN
from gigagan_tpu.utils import cycle

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
what = sys.argv[2] if len(sys.argv) > 2 else "dg"
gp_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else None

gan = GigaGAN(
    gp_chunk=gp_chunk,
    generator=dict(
        dim_capacity=8, style_network=dict(dim=64, depth=4), image_size=256,
        dim_max=512, num_skip_layers_excite=4, unconditional=True,
    ),
    discriminator=dict(
        dim_capacity=16, dim_max=512, image_size=256,
        num_skip_layers_excite=4, unconditional=True,
    ),
    amp=True,
    model_folder="/tmp/gigagan-min/models",
    results_folder="/tmp/gigagan-min/results",
    log_steps_every=10 ** 9, save_and_sample_every=10 ** 9,
    early_save_thres_steps=0, seed=0,
)
ds = MockImageDataset(256, length=max(2 * B, 16), seed=0)
dl = cycle(ds.get_dataloader(B))
batch = gan._collect_batch(dl, 1)

if "d" in what:
    gan.train_discriminator_step(
        batch, grad_accum_every=1, apply_gradient_penalty=False,
        calc_multiscale_loss=True,
    )
    jax.block_until_ready(gan.state.d_params)
    print("d_step (no GP) ok", flush=True)
if "g" in what:
    gan.train_generator_step(
        batch, grad_accum_every=1, calc_multiscale_loss=True,
    )
    jax.block_until_ready(gan.state.g_params)
    print("g_step ok", flush=True)
if "p" in what:
    gan.train_discriminator_step(
        batch, grad_accum_every=1, apply_gradient_penalty=True,
        calc_multiscale_loss=True,
    )
    jax.block_until_ready(gan.state.d_params)
    print("d_step (GP) ok", flush=True)
