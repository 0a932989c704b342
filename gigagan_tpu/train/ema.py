"""Exponential moving average of generator params.

Parity target: ema_pytorch.EMA as configured by the reference trainer
(gigagan_pytorch.py:2173-2185): beta=0.995, update_every=10,
update_after_step=100, with ema_pytorch's default decay warm-up ramp
1 - (1 + t)^(-2/3) clamped to beta.

Pure-functional: `ema_update` is jit-safe and branchless (lax.select on the
step counter), so the trainer can fold it into the jitted G step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax.flatten_util import ravel_pytree


@struct.dataclass
class EMAState:
    params: any
    initted: jnp.ndarray  # bool scalar
    step: jnp.ndarray  # int32: number of .update() calls

    @classmethod
    def create(cls, params):
        # deep-copy: EMA params must not alias the live params, or donating
        # the train state donates the same buffer twice and XLA aborts
        return cls(
            params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
            initted=jnp.asarray(False),
            step=jnp.asarray(0, jnp.int32),
        )


def ema_update(
    state: EMAState,
    params,
    *,
    beta: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    step = state.step + 1

    # ema_pytorch semantics: before update_after_step, hard-copy; afterwards
    # lerp at the ramped decay, only on update_every boundaries.
    should_update = (step % update_every) == 0
    warm = step <= (update_after_step + 1)

    # decay ramp indexed by steps past the warmup boundary
    t = jnp.clip(step - update_after_step - 1, 0).astype(jnp.float32)
    decay = 1.0 - (1.0 + t / inv_gamma) ** (-power)
    decay = jnp.clip(decay, min_value, beta)
    # hard copy during warmup or on the very first update
    decay = jnp.where(warm | ~state.initted, 0.0, decay)

    def lerp(old, new):
        new = new.astype(old.dtype)
        # the f32 decay multiply promotes non-f32 leaves; cast back so both
        # the flat and per-leaf paths genuinely preserve leaf dtypes
        mixed = (old * decay + new * (1.0 - decay)).astype(old.dtype)
        return jnp.where(should_update | ~state.initted, mixed, old)

    # one-leaf-at-a-time lerp costs ~1.2 μs/launch of dispatch per leaf
    # (scripts/bench_op_overhead.py); on homogeneous trees (the G's params
    # are uniformly fp32) ravel to a single vector, lerp once, and unravel
    # back (one fused slice per leaf).  Heterogeneous trees keep the
    # per-leaf path for dtype fidelity.
    leaves = jax.tree.leaves(state.params)
    if len({jnp.asarray(x).dtype for x in leaves}) <= 1 and len(leaves) > 1:
        old_flat, unravel = ravel_pytree(state.params)
        new_flat = ravel_pytree(
            jax.tree.map(lambda o, n: n.astype(o.dtype), state.params, params)
        )[0]
        new_params = unravel(lerp(old_flat, new_flat))
    else:
        new_params = jax.tree.map(lerp, state.params, params)
    return EMAState(
        params=new_params,
        initted=state.initted | should_update,
        step=step,
    )
