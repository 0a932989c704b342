"""FLOP/byte floor analysis of the bench train steps via XLA cost analysis.

Lowers the exact bench.py step variants (batch from BENCH_BATCH) and prints
XLA's estimated flops / bytes accessed per step, plus the implied MXU /
HBM-roofline floor on v5e (197 bf16 TFLOP/s, 819 GB/s) — the honest
"speed of light" for the current graph structure.  Runs on any backend
(cost analysis is of the optimized module; CPU numbers for flops are close
to the TPU module's, layouts aside).

Usage: [JAX_PLATFORMS=cpu] python scripts/flops_step.py
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from gigagan_tpu.data import MockImageDataset
from gigagan_tpu.train import GigaGAN
from gigagan_tpu.utils import cycle

BATCH = int(os.environ.get("BENCH_BATCH", "8"))

V5E_TFLOPS = 197e12  # bf16 MXU peak
V5E_HBM = 819e9      # bytes/s


def main():
    gan = GigaGAN(
        generator=dict(
            dim_capacity=8,
            style_network=dict(dim=64, depth=4),
            image_size=256,
            dim_max=512,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16,
            dim_max=512,
            image_size=256,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        amp=True,
        model_folder="/tmp/gigagan-flops/models",
        results_folder="/tmp/gigagan-flops/results",
        log_steps_every=10 ** 9,
        save_and_sample_every=10 ** 9,
        early_save_thres_steps=0,
        seed=0,
    )
    ds = MockImageDataset(256, length=max(4 * BATCH, 64), seed=0)
    dl = cycle(ds.get_dataloader(BATCH))
    batch = gan._collect_batch(dl, 1)
    key = gan._next_key()

    variants = {
        "d_step(noGP)": gan.builder.d_step_fn(
            grad_accum_every=1, apply_gp=False, calc_ms=True),
        "d_step(GP)": gan.builder.d_step_fn(
            grad_accum_every=1, apply_gp=True, calc_ms=True),
        "g_step": gan.builder.g_step_fn(grad_accum_every=1, calc_ms=True),
    }
    total_nogp = total_gp = 0.0
    for name, fn in variants.items():
        c = fn.lower(gan.state, batch, key, gan._frozen).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops", 0.0)
        by = ca.get("bytes accessed", 0.0)
        t_mxu = fl / V5E_TFLOPS * 1e3
        t_hbm = by / V5E_HBM * 1e3
        # NOTE: "bytes accessed" is summed over HLO ops BEFORE accounting
        # for producer-consumer fusion, so the hbm column massively
        # overestimates real traffic — report it, but floor on MXU only.
        print(f"{name:14s} flops={fl/1e12:7.3f}T bytes={by/1e9:7.2f}GB "
              f"mxu_floor={t_mxu:6.2f}ms (hbm_prefusion={t_hbm:6.2f}ms)")
        if "noGP" in name or name == "g_step":
            total_nogp += t_mxu
        if "(GP)" in name or name == "g_step":
            total_gp += t_mxu
    print(f"\nper-iteration MXU floors (d+g): "
          f"noGP={total_nogp:.2f}ms GP={total_gp:.2f}ms")
    avg = (total_gp + 3 * total_nogp) / 4
    print(f"bench MXU floor (GP every 4): {avg:.2f}ms/iter → "
          f"{BATCH / avg * 1e3:.1f} img/s ceiling")
    # measured round-3 reference points (v5e device traces, DESIGN.md):
    # noGP 96ms (2.0x floor), GP 197ms (2.3x floor) at batch 8.


if __name__ == "__main__":
    main()
