"""Minimal repro: which jitted piece fails to compile at batch 16 on TPU."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

from gigagan_tpu.models import Discriminator, Generator

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
what = sys.argv[2] if len(sys.argv) > 2 else "all"

g = Generator(
    dim_capacity=8, style_network=dict(dim=64, depth=4), image_size=256,
    dim_max=512, num_skip_layers_excite=4, unconditional=True,
    dtype=jnp.bfloat16,
)
d = Discriminator(
    dim_capacity=16, dim_max=512, image_size=256, num_skip_layers_excite=4,
    unconditional=True, dtype=jnp.bfloat16,
)
k = jax.random.PRNGKey(0)

if what in ("all", "g"):
    gv = g.init({"params": k, "noise": k, "latent": k}, batch_size=1)
    fwd = jax.jit(lambda v, key: g.apply(
        v, batch_size=B, return_all_rgbs=True,
        rngs={"noise": key, "latent": key}))
    out, rgbs = fwd(gv, k)
    jax.block_until_ready(out)
    print("G fwd ok", out.shape, flush=True)

if what in ("all", "d"):
    imgs = jnp.zeros((B, 256, 256, 3), jnp.bfloat16)
    rgbs = d.real_images_to_rgbs(imgs)
    dv = d.init({"params": k, "dropout": k}, imgs, rgbs)

    def loss(v, imgs, rgbs):
        logits, ms, aux = d.apply(
            v, imgs, rgbs, calc_aux_loss=True, rngs={"dropout": k})
        return jnp.mean(logits) + sum(jnp.mean(m) for m in ms) + sum(aux)

    val, grads = jax.jit(jax.value_and_grad(loss))(dv, imgs, rgbs)
    jax.block_until_ready(val)
    print("D fwd+bwd ok", val, flush=True)
