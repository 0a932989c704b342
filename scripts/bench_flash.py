"""Measure flash_attend vs XLA attention fwd/bwd on the real chip at
GigaGAN sizes. Usage: python scripts/bench_flash.py [b h n d]"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from gigagan_tpu.ops.attention import attend
from gigagan_tpu.ops.pallas.flash_attention import flash_attend

b, h, n, d = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (
    8, 8, 1024, 64)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 3)
q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


for l2 in (False, True):
    xla_fwd = jax.jit(lambda q, k, v: attend(q, k, v, l2_dist=l2,
                                             use_flash=False))
    fl_fwd = jax.jit(lambda q, k, v: flash_attend(q, k, v, None, l2))

    def loss_x(q, k, v):
        return jnp.sum(attend(q, k, v, l2_dist=l2, use_flash=False) ** 2)

    def loss_f(q, k, v):
        return jnp.sum(flash_attend(q, k, v, None, l2) ** 2)

    xla_bwd = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    fl_bwd = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))

    # numerics check fwd + bwd
    import numpy as np
    a1 = np.asarray(xla_fwd(q, k, v), np.float32)
    a2 = np.asarray(fl_fwd(q, k, v), np.float32)
    print(f"l2={l2} fwd maxdiff {np.abs(a1 - a2).max():.4e}", flush=True)
    g1 = xla_bwd(q, k, v)
    g2 = fl_bwd(q, k, v)
    for name, x1, x2 in zip("qkv", g1, g2):
        md = np.abs(np.asarray(x1, np.float32) - np.asarray(x2, np.float32)
                    ).max()
        print(f"  d{name} maxdiff {md:.4e}", flush=True)

    t_xf = timeit(xla_fwd, q, k, v)
    t_ff = timeit(fl_fwd, q, k, v)
    t_xb = timeit(xla_bwd, q, k, v)
    t_fb = timeit(fl_bwd, q, k, v)
    print(
        f"l2={l2} ({b},{h},{n},{d}): fwd xla {t_xf:.2f}ms flash {t_ff:.2f}ms"
        f" | fwd+bwd xla {t_xb:.2f}ms flash {t_fb:.2f}ms", flush=True,
    )
