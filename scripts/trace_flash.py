"""Device-trace the flash attention kernels at a given shape.

Chained iterations (output feeds the next query) force real execution
through the relay; the perfetto trace gives per-kernel device time.
Usage: python scripts/trace_flash.py [b h n d] [l2]
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

from gigagan_tpu.ops.pallas.flash_attention import flash_attend

b, h, n, d = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (
    64, 8, 1024, 64)
l2 = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
USE_XLA = len(sys.argv) > 6 and sys.argv[6] == "xla"
ITERS = 8
TRACE_DIR = "/tmp/flash_trace"

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 3)
q = jax.random.normal(ks[0], (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(ks[1], (b, h, n + 1, d), jnp.bfloat16)
v = jax.random.normal(ks[2], (b, h, n + 1, d), jnp.bfloat16)


if USE_XLA:
    from gigagan_tpu.ops.attention import attend

    def _att(q, k, v):
        return attend(q, k, v, l2_dist=l2, use_flash=False)
else:
    def _att(q, k, v):
        return flash_attend(q, k, v, None, l2)


@jax.jit
def fwd(q, k, v):
    return _att(q, k, v)


@jax.jit
def fwdbwd(q, k, v):
    def loss(q, k, v):
        return jnp.sum(_att(q, k, v) ** 2)

    l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    return grads[0]


x = fwd(q, k, v)
y = fwdbwd(q, k, v)
jax.block_until_ready((x, y))

with jax.profiler.trace(TRACE_DIR):
    x = q
    for _ in range(ITERS):
        x = fwd(x, k, v)
    import numpy as np

    _ = np.asarray(x[0, 0, 0, :4])
    y = q
    for _ in range(ITERS):
        y = fwdbwd(y, k, v)
    _ = np.asarray(y[0, 0, 0, :4])

files = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, nm in pid_names.items()
               if "TPU" in nm or "Device" in nm}
agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in device_pids:
        nm = e.get("name", "?")
        agg[nm] += e.get("dur", 0) / 1e3
        cnt[nm] += 1
print(f"shape ({b},{h},{n},{d}) l2={l2}, {ITERS} iters each:")
for nm, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  {ms / ITERS:8.3f}ms/call x{cnt[nm] // ITERS} {nm[:80]}")
