"""Quantify per-op overhead inside one compiled program on this chip:
N small independent elementwise chains (like a tree optimizer over N params)
vs the same math on one flat array.  Informs whether a flattened optimizer/
EMA is worth it."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

N = 300          # ~param count of the quickstart G+D
SIZE = 200_000   # ~elements per param (30-60M total / 300)

keys = jax.random.split(jax.random.PRNGKey(0), 4)
params = [jax.random.normal(keys[0], (SIZE,)) for _ in range(N)]
grads = [jax.random.normal(keys[1], (SIZE,)) for _ in range(N)]
mu = [jnp.zeros((SIZE,)) for _ in range(N)]
nu = [jnp.zeros((SIZE,)) for _ in range(N)]


def adam_math(p, g, m, v):
    m = 0.9 * m + 0.1 * g
    v = 0.99 * v + 0.01 * g * g
    upd = m / (jnp.sqrt(v) + 1e-8)
    return p - 1e-3 * upd, m, v


@jax.jit
def tree_step(params, grads, mu, nu):
    out = [adam_math(p, g, m, v)
           for p, g, m, v in zip(params, grads, mu, nu)]
    return ([o[0] for o in out], [o[1] for o in out], [o[2] for o in out])


flat_p = jnp.concatenate(params)
flat_g = jnp.concatenate(grads)
flat_m = jnp.concatenate(mu)
flat_v = jnp.concatenate(nu)


@jax.jit
def flat_step(p, g, m, v):
    return adam_math(p, g, m, v)


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


t_tree = timeit(tree_step, params, grads, mu, nu)
t_flat = timeit(flat_step, flat_p, flat_g, flat_m, flat_v)
per_op_overhead_us = (t_tree - t_flat) / (N * 10) * 1e3
print(f"tree ({N} params x ~10 ops): {t_tree:.2f}ms")
print(f"flat (1 array, same elements): {t_flat:.2f}ms")
print(f"implied overhead per small op: {per_op_overhead_us:.2f}us")
