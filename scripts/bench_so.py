"""Device-trace the second-order flash attention family at a given shape.

Times three launches separately — forward, first backward (flash_bwd_so),
and the second-order adjoint (_bwd2_kernel) — plus the FIRST-ORDER fused
backward at the same shape for comparison.  Chained iterations force real
execution through the relay; the perfetto trace gives per-kernel device
time.  Usage:
  python scripts/bench_so.py [b n heads d] [bwd_kb bwd2_kb] [ffwd_kb]
"""
import glob
import gzip
import json
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import gigagan_tpu.ops.pallas.flash_attention_fused as ff
import gigagan_tpu.ops.pallas.flash_attention_so as so
from gigagan_tpu.ops.pallas.flash_attention_fused import flash_attend_fused

b, n, heads, d = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (
    48, 1024, 8, 64)
if len(sys.argv) > 6:
    so._BWD_BUDGET = int(sys.argv[5]) * 1024
    so._BWD2_BUDGET = int(sys.argv[6]) * 1024
if len(sys.argv) > 7:
    ff._FWD_BUDGET = int(sys.argv[7]) * 1024
ITERS = 8
TRACE_DIR = "/tmp/so_trace"

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
hd = heads * d
q = jax.random.normal(ks[0], (b, n, hd), jnp.bfloat16)
k = jax.random.normal(ks[1], (b, n, hd), jnp.bfloat16)
v = jax.random.normal(ks[2], (b, n, hd), jnp.bfloat16)
null_kv = jax.random.normal(ks[3], (2, heads, d), jnp.float32)
g = jax.random.normal(ks[4], (b, n, hd), jnp.bfloat16)


@jax.jit
def fused_bwd(q, k, v, g):
    _, vjp = jax.vjp(
        lambda q, k, v, nk: flash_attend_fused(q, k, v, nk, heads, True),
        q, k, v, null_kv,
    )
    return vjp(g)[:3]


@jax.jit
def so_bwd(q, k, v, g):
    lse = so._so_fwd_op(q, k, v, null_kv, heads, True)[1]
    return so.flash_bwd_so(q, k, v, null_kv, g, lse, heads, True)[:3]


@jax.jit
def so_bwd2(q, k, v, g):
    # grad of sum|dq|^2+|dk|^2+|dv|^2 wrt (q,k,v,g): one _bwd_sc launch
    # in the fwd pass + ONE _bwd2 launch in the bwd pass
    def f(q, k, v, g):
        lse = so._so_fwd_op(q, k, v, null_kv, heads, True)[1]
        dq, dk, dv, _ = so.flash_bwd_so(q, k, v, null_kv, g, lse, heads,
                                        True)
        s = lambda t: jnp.sum(t.astype(jnp.float32) ** 2)
        return s(dq) + s(dk) + s(dv)

    return jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, g)


def chain(fn, q):
    for _ in range(ITERS):
        out = fn(q, k, v, g)
        q = out[0].astype(q.dtype)
    return q


# compile
for fn in (fused_bwd, so_bwd, so_bwd2):
    jax.block_until_ready(fn(q, k, v, g))

with jax.profiler.trace(TRACE_DIR):
    import numpy as np

    q1 = chain(fused_bwd, q)
    q2 = chain(so_bwd, q1)
    q3 = chain(so_bwd2, q2)
    np.asarray(jnp.sum(q3[:1, :1, :1]))

files = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, nm in pid_names.items()
               if "TPU" in nm or "/device" in nm.lower()}
agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
        continue
    top = (e.get("args") or {}).get("tf_op") or e.get("name", "?")
    agg[top] += e.get("dur", 0) / 1000.0
    cnt[top] += 1
print(f"shape b={b} n={n} heads={heads} d={d} "
      f"budgets so {so._BWD_BUDGET//1024}K/{so._BWD2_BUDGET//1024}K "
      f"fused fwd {ff._FWD_BUDGET//1024}K")
for kk, vv in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{vv/ITERS:8.3f}ms x{cnt[kk]//ITERS:<3} {kk[:110]}")
import shutil

shutil.rmtree(TRACE_DIR, ignore_errors=True)
