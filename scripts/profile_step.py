"""Profile D/G step times at several batch sizes on the real chip.

Usage: python scripts/profile_step.py [batch ...]
"""
import pathlib
import sys
import time

# make the repo importable without PYTHONPATH (mutating PYTHONPATH breaks
# the axon remote-compile helper subprocess, which inherits the env)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from gigagan_tpu.data import MockImageDataset
from gigagan_tpu.train import GigaGAN
from gigagan_tpu.utils import cycle


def build(batch, gp_chunk=None):
    gan = GigaGAN(
        gp_chunk=gp_chunk,
        generator=dict(
            dim_capacity=8, style_network=dict(dim=64, depth=4),
            image_size=256, dim_max=512, num_skip_layers_excite=4,
            unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16, dim_max=512, image_size=256,
            num_skip_layers_excite=4, unconditional=True,
        ),
        amp=True,
        model_folder="/tmp/gigagan-prof/models",
        results_folder="/tmp/gigagan-prof/results",
        log_steps_every=10 ** 9, save_and_sample_every=10 ** 9,
        early_save_thres_steps=0, seed=0,
    )
    ds = MockImageDataset(256, length=max(2 * batch, 16), seed=0)
    dl = cycle(ds.get_dataloader(batch))
    batches = [gan._collect_batch(dl, 1) for _ in range(2)]
    return gan, batches


def time_fn(fn, n=6):
    fn(0)  # compile
    jax.effects_barrier()
    t0 = time.perf_counter()
    for i in range(n):
        fn(i + 1)
    return (time.perf_counter() - t0) / n


def main():
    import os
    gp_chunk = os.environ.get("GP_CHUNK")
    gp_chunk = int(gp_chunk) if gp_chunk else None
    batches_to_try = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for b in batches_to_try:
        gan, batches = build(b, gp_chunk)

        def d_step(i, gp):
            gan.train_discriminator_step(
                batches[i % 2], grad_accum_every=1,
                apply_gradient_penalty=gp, calc_multiscale_loss=True,
            )
            jax.block_until_ready(gan.state.d_params)

        def g_step(i):
            gan.train_generator_step(
                batches[i % 2], grad_accum_every=1, calc_multiscale_loss=True,
            )
            jax.block_until_ready(gan.state.g_params)

        try:
            t_d = time_fn(lambda i: d_step(i, False))
            t_g = time_fn(g_step)
            t_dgp = time_fn(lambda i: d_step(i, True))
            iter_no_gp = t_d + t_g
            iter_gp = t_dgp + t_g
            avg = (3 * iter_no_gp + iter_gp) / 4
            print(
                f"batch {b}: D {t_d*1e3:.0f}ms  G {t_g*1e3:.0f}ms  "
                f"D+GP {t_dgp*1e3:.0f}ms | iter {iter_no_gp*1e3:.0f}ms "
                f"gp-iter {iter_gp*1e3:.0f}ms | avg {avg*1e3:.0f}ms "
                f"→ {b/avg:.1f} img/s", flush=True,
            )
        except Exception as e:
            print(f"batch {b}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
