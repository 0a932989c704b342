"""Device A/B of the scattered s2d conv lowerings at the bench's real
stage shapes: native XLA conv vs shifted-matmul ("taps").

The round-3 no-GP trace shows s2d_conv at ~15.6 ms/iter over 94 launches
(~0.17 ms each), far above both the MXU and HBM floors of those shapes —
the hypothesis is that XLA's conv lowering at small K / dense-lane
channels is the gap, and KY·KX MXU-shaped dot_generals close it.  This
script times fwd and fwd+bwd per shape per mode with the chained-calls
one-fetch wall protocol (DESIGN.md).

Usage: python scripts/bench_s2d.py  (flips gigagan_tpu.ops.s2d._CONV_MODE)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from gigagan_tpu.ops import s2d
from gigagan_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

ITERS = 32

# (b, grid, ci, co, k, stride, in_s2d): bench-config D+G s2d stages —
# grid = s2d grid (half the pixel res), channels are the ORIGINAL counts
SHAPES = [
    (16, 128, 16, 32, 3, 1, True),    # D 256px stage convs (batch 2b)
    (16, 128, 16, 32, 1, 2, True),    # D residual 1x1 stride 2
    (16, 64, 32, 64, 3, 1, True),     # D 128px stage
    (16, 32, 64, 128, 3, 1, True),    # D 64px stage
    (8, 128, 8, 8, 3, 1, True),       # G 256px stage convs
    (8, 128, 3, 16, 3, 1, False),     # D from_rgb entry form
]


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    for (b, g, ci, co, k, stride, in_s2d) in SHAPES:
        kx = jax.random.PRNGKey(0)
        if in_s2d:
            x = jax.random.normal(kx, (b, g, g, 4 * ci), jnp.bfloat16)
        else:
            x = jax.random.normal(kx, (b, 2 * g, 2 * g, ci), jnp.bfloat16)
        w = jax.random.normal(
            jax.random.PRNGKey(1), (k, k, ci, co), jnp.bfloat16
        )
        line = [f"b{b} g{g} {ci}->{co} k{k} s{stride} in_s2d={in_s2d}:"]
        for mode in ("conv", "taps"):
            s2d._CONV_MODE = mode

            @jax.jit
            def fwd(x, w):
                return s2d.s2d_conv(x, w, stride=stride, in_s2d=in_s2d)

            @jax.jit
            def fwdbwd(x, w):
                def loss(x, w):
                    return jnp.sum(
                        s2d.s2d_conv(
                            x, w, stride=stride, in_s2d=in_s2d
                        ).astype(jnp.float32) ** 2
                    )
                return jax.grad(loss, argnums=(0, 1))(x, w)

            tf = timeit(fwd, x, w)
            tb = timeit(fwdbwd, x, w)
            line.append(f"{mode}: fwd {tf:7.3f}ms fwd+bwd {tb:7.3f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
