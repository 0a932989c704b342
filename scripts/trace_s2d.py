"""Per-shape DEVICE-TRACE timing of the scattered s2d convs at the bench's
stage shapes (wall-clock per-call timing is unreliable through this relay —
DESIGN.md measurement discipline).  Runs each (shape, mode) as a jitted
loop of ITERS applications, then reports device op-time per application.

Usage: python scripts/trace_s2d.py [fwd|fwdbwd]
"""
import glob
import gzip
import json
import pathlib
import re
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from gigagan_tpu.ops import s2d
from gigagan_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

MODE = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
ITERS = 16
TRACE_DIR = "/tmp/gigagan_s2d_trace"

# (tag, b, grid, ci, co, k, stride, in_s2d) — bench-config D+G s2d stages;
# d_step applies D at 2*mb ([real; fake]) = 16
SHAPES = [
    ("D256", 16, 128, 16, 32, 3, 1, True),
    ("D256res", 16, 128, 16, 32, 1, 2, True),
    ("D128", 16, 64, 32, 64, 3, 1, True),
    ("D64", 16, 32, 64, 128, 3, 1, True),
    ("G256", 8, 128, 8, 8, 3, 1, True),
    ("DfromRGB", 16, 128, 3, 16, 3, 1, False),
]

# (tag, b, r, cin4, cout) — dense_to_s2d (Downsample in the s2d trunk):
# x (b, r, r, cin4) @ (cin4, cout) → (b, r/2, r/2, 4·cout).  A/B between
# the polyphase einsum ("auto") and the scattered 2×2 conv ("conv").
D2S_SHAPES = [
    ("Dds256", 16, 128, 64, 32),
    ("Dds128", 16, 64, 128, 64),
    ("Dds64", 16, 32, 256, 128),
]


def build(tag, b, g, ci, co, k, stride, in_s2d, conv_mode):
    if in_s2d:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (b, g, g, 4 * ci), jnp.bfloat16
        )
    else:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (b, 2 * g, 2 * g, ci), jnp.bfloat16
        )
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, ci, co),
                          jnp.bfloat16)

    def apply_once(x, w):
        old = s2d._CONV_MODE
        s2d._CONV_MODE = conv_mode
        try:
            return s2d.s2d_conv(x, w, stride=stride, in_s2d=in_s2d)
        finally:
            s2d._CONV_MODE = old

    if MODE == "fwd":
        @jax.jit
        def run(x, w):
            def body(c, _):
                y = apply_once(c, w)
                # re-derive a same-shaped carry so the loop can't fold
                red = jnp.mean(y.astype(jnp.float32))
                return c + (red * 0).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return c
    else:
        @jax.jit
        def run(x, w):
            def body(c, _):
                def loss(x, w):
                    return jnp.sum(
                        apply_once(x, w).astype(jnp.float32) ** 2
                    )
                gx, gw = jax.grad(loss, argnums=(0, 1))(c, w)
                return c + gx.astype(c.dtype) * 0 + c * 0, ()
            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return c
    return run, x, w


def build_d2s(tag, b, r, cin4, cout, conv_mode):
    x = jax.random.normal(
        jax.random.PRNGKey(0), (b, r, r, cin4), jnp.bfloat16
    )
    w = jax.random.normal(jax.random.PRNGKey(1), (cin4, cout), jnp.bfloat16)

    def apply_once(x, w):
        old = s2d._CONV_MODE
        s2d._CONV_MODE = conv_mode
        try:
            return s2d.dense_to_s2d(x, w)
        finally:
            s2d._CONV_MODE = old

    if MODE == "fwd":
        @jax.jit
        def run(x, w):
            def body(c, _):
                red = jnp.mean(apply_once(c, w).astype(jnp.float32))
                return c + (red * 0).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return c
    else:
        @jax.jit
        def run(x, w):
            def body(c, _):
                def loss(x, w):
                    return jnp.sum(
                        apply_once(x, w).astype(jnp.float32) ** 2
                    )
                gx, gw = jax.grad(loss, argnums=(0, 1))(c, w)
                return c + gx.astype(c.dtype) * 0 + c * 0, ()
            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return c
    return run, x, w


def main():
    jobs = []
    for spec in SHAPES:
        tag, b, g, ci, co, k, stride, in_s2d = spec
        eligible = k == 3 and stride == 1 and in_s2d  # blocks form
        modes = ("conv", "taps", "blocks") if eligible else ("conv", "taps")
        for conv_mode in modes:
            run, x, w = build(*spec, conv_mode)
            jax.block_until_ready(run(x, w))  # compile
            jobs.append((spec[0], conv_mode, run, x, w))
    for spec in D2S_SHAPES:
        # "blocks" FORCES the polyphase einsum so every shape gets a real
        # A/B ("auto" only selects the einsum at cin>=256, which made the
        # narrow-cin rows compare the scattered conv against itself —
        # ADVICE r4)
        for conv_mode in ("blocks", "conv"):  # einsum vs scattered 2×2 conv
            run, x, w = build_d2s(*spec, conv_mode)
            jax.block_until_ready(run(x, w))  # compile
            jobs.append((spec[0], conv_mode, run, x, w))

    with jax.profiler.trace(TRACE_DIR):
        for tag, conv_mode, run, x, w in jobs:
            jax.block_until_ready(run(x, w))

    files = sorted(
        glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    )
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    # program spans appear in submission order — match them to jobs
    prog = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_run"):
            prog[e["ts"]] = e.get("dur", 0) / 1e3
    spans = [d for _, d in sorted(prog.items())]
    print(f"{len(spans)} program spans for {len(jobs)} jobs ({MODE})")
    out = {}
    for (tag, conv_mode, _, x, w), dur in zip(jobs, spans):
        ms = dur / ITERS
        out[f"{tag}/{conv_mode}"] = round(ms, 4)
        print(f"{tag:9s} {conv_mode:4s} {ms:7.3f} ms/app  "
              f"x={tuple(x.shape)} w={tuple(w.shape)}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
