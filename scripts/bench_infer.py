"""Inference latency/throughput receipts vs the GigaGAN paper's A100 numbers.

The paper (arXiv 2303.05511, cited in the reference README.md:233-241)
reports 0.13 s for 512px synthesis and 3.66 s for 4K (16 MP) upsampling on
A100.  This script measures the equivalents on the local chip with
README-quickstart-shaped models (random weights — latency does not depend
on the weight values):

  1. 256px synthesis throughput (batch 8) and latency (batch 1)
  2. 512px synthesis latency (batch 1)
  3. 64->256 upsampler latency (batch 1)
  4. 1K->4K upsampler latency (batch 1; skipped gracefully on OOM)

Measurement: many chained jitted calls with ONE final host fetch (the only
trustworthy wall protocol through the axon relay — see DESIGN.md), warmup
excluded.  Prints one JSON line.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from gigagan_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

ITERS = 8
# 1K->4K compiles for many minutes through the relay; gate it so the fast
# receipts always land even if a run is cut short (INFER_4K=0 to skip)
WITH_4K = os.environ.get("INFER_4K", "1") == "1"


def _note(key, val):
    """Incremental receipt: print each measurement as it lands so a
    truncated run still leaves numbers behind."""
    print(f"# {key} = {val}", flush=True)


def _time(fn, *args):
    """Chained-wall protocol: warmup+compile, then ITERS chained calls and
    one fetch; returns (seconds/call chained, seconds/call single-dispatch).

    The chained number amortizes dispatch (throughput-flavored); the
    single-dispatch number is a true submit->fetch latency per call (median
    of ITERS calls, each individually fetched) — it includes the ~30 ms
    host-fetch cost of this relay and is the honest comparison point against
    the paper's single-image 0.13 s / 3.66 s figures."""
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    chained = (time.perf_counter() - t0) / ITERS

    singles = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        singles.append(time.perf_counter() - t0)
    return chained, sorted(singles)[len(singles) // 2]


def base_generator(image_size):
    from gigagan_tpu.models import Generator

    return Generator(
        dim_capacity=8,
        image_size=image_size,
        dim_max=512,
        num_skip_layers_excite=4,
        unconditional=True,
        style_network=dict(dim=64, depth=4),
        dtype=jnp.bfloat16,
    )


def synth_latency(image_size, batch):
    g = base_generator(image_size)
    k = jax.random.PRNGKey(0)
    params = g.init(
        {"params": k, "noise": k, "latent": k}, batch_size=batch
    )["params"]

    @jax.jit
    def run(params, key):
        kn, kl = jax.random.split(key)
        return g.apply({"params": params}, batch_size=batch,
                       rngs={"noise": kn, "latent": kl})

    return _time(run, params, k)


def upsampler_latency(in_size, out_size, dim=32, full_attn=None):
    from gigagan_tpu.models.unet_upsampler import UnetUpsampler

    kwargs = {}
    if full_attn is not None:
        kwargs["full_attn"] = full_attn
    g = UnetUpsampler(
        dim=dim,
        image_size=out_size,
        input_image_size=in_size,
        unconditional=True,
        style_network=dict(dim=64, depth=4),
        dtype=jnp.bfloat16,
        **kwargs,
    )
    k = jax.random.PRNGKey(0)
    low = jax.random.uniform(k, (1, in_size, in_size, 3), jnp.bfloat16)
    params = g.init(
        {"params": k, "noise": k, "latent": k}, lowres_image=low
    )["params"]

    @jax.jit
    def run(params, low, key):
        kn, kl = jax.random.split(key)
        return g.apply({"params": params}, lowres_image=low,
                       rngs={"noise": kn, "latent": kl})

    return _time(run, params, low, k)


def main():
    result = {"unit": "seconds/batch unless noted"}

    def put(key, val):
        result[key] = val
        _note(key, val)

    t, _ = synth_latency(256, 8)
    put("synth_256px_batch8_images_per_sec", round(8 / t, 2))
    t, s = synth_latency(256, 1)
    put("synth_256px_batch1_latency_s", round(t, 4))
    put("synth_256px_batch1_single_dispatch_s", round(s, 4))
    t, s = synth_latency(512, 1)
    put("synth_512px_batch1_latency_s", round(t, 4))
    put("synth_512px_batch1_single_dispatch_s", round(s, 4))
    put("paper_a100_512px_latency_s", 0.13)
    t, s = upsampler_latency(64, 256)
    put("upsample_64_to_256_latency_s", round(t, 4))
    put("upsample_64_to_256_single_dispatch_s", round(s, 4))
    if WITH_4K:
        try:
            # all-linear attention: at 4096px the default full_attn
            # stages sit at 512²=262144 tokens — 17.6 PFLOP/layer of
            # full attention, infeasible on ANY hardware (so the paper's
            # 3.66 s figure cannot be the repo-default config either;
            # the reference repo never demonstrates 4K).  The linear-
            # attention stages are the architecture's own O(n) path
            # (reference unet_upsampler.py LinearTransformer).
            t, s = upsampler_latency(1024, 4096, full_attn=(False,) * 5)
            put("upsample_1k_to_4k_latency_s", round(t, 4))
            put("upsample_1k_to_4k_single_dispatch_s", round(s, 4))
            put("upsample_1k_to_4k_config", "all linear attention")
            put("paper_a100_4k_latency_s", 3.66)
        except Exception as e:  # noqa: BLE001 — OOM at 4K is env-bound
            put("upsample_1k_to_4k_latency_s",
                f"skipped: {type(e).__name__}: {e}"[:300])
    else:
        put("upsample_1k_to_4k_latency_s", "skipped: INFER_4K=0")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
