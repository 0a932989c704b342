"""On-chip exactness receipts for every Pallas kernel family (VERDICT r3
item 4): run the REAL compiled kernels on this device against the XLA math
path at the bench's production shapes — forward, first-order VJP, the
grad-of-jvp (hv) pair, and the second-order (reverse-over-reverse) adjoint
— and record a JSON verdict.

CPU interpret-mode exactness lives in tests/test_pallas.py; this script is
the missing half: proof the Mosaic-compiled kernels are numerically right
on the hardware the bench runs on, so bench.py's GIGAGAN_FLASH=0 fallback
is a never-fires safety net.

Usage: python scripts/verify_kernels.py [out.json]
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from gigagan_tpu.ops.adaptive_conv import adaptive_conv
from gigagan_tpu.ops.attention import attend, attend_fused
from gigagan_tpu.ops.pallas.flash_attention import flash_attend
from gigagan_tpu.ops.pallas.flash_attention_fused import flash_attend_fused
from gigagan_tpu.ops.pallas.flash_attention_hv import flash_attend_hv
from gigagan_tpu.ops.pallas.flash_attention_so import flash_attend_so
from gigagan_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

RESULTS = []


def rel_err(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    denom = np.abs(want).max() + 1e-6
    return float(np.abs(got - want).max() / denom)


def record(name, pairs, tol):
    """pairs: list of (label, got, want). Max relative error over all."""
    worst = 0.0
    for label, got, want in pairs:
        e = rel_err(got, want)
        worst = max(worst, e)
    ok = bool(np.isfinite(worst)) and worst <= tol
    RESULTS.append(
        {"kernel": name, "max_rel_err": round(worst, 8), "tol": tol,
         "ok": ok}
    )
    print(f"{'OK ' if ok else 'FAIL'} {name}: max_rel_err={worst:.3e} "
          f"(tol {tol})", flush=True)


def check_adaptive_conv():
    """Fused adaptive conv (fwd + all four grads) at the bench G's widest
    stage shape, bf16 operands like the amp step — each path judged
    against the fp32 XLA oracle.

    A bf16-vs-bf16 pairwise check is NOT a valid oracle here: dkmod is a
    tiny residual of ~spatial·o cancelling terms, and on v5e the bf16 XLA
    path measured 1.18 max-rel-err against the fp32 truth while the Pallas
    kernel (fp32 accumulators end-to-end) sat at 0.026 — i.e. the kernel
    was RIGHT and the naive oracle wrong (round 4; the XLA mixing einsum
    has since gained fp32 accumulation too)."""
    b, h, w, ci, co, n = 8, 32, 32, 256, 256, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xf = jax.random.normal(ks[0], (b, h, w, ci), jnp.float32)
    wf = jax.random.normal(ks[1], (n, 3, 3, ci, co)) * 0.2
    mf = jax.random.normal(ks[2], (b, ci), jnp.float32)
    kf = jax.random.normal(ks[3], (b, n), jnp.float32)

    def loss(dtype, use_pallas):
        args = [t.astype(dtype) for t in (xf, wf, mf, kf)]

        def f(x, w, m, km):
            out = adaptive_conv(x, w, m, km, use_pallas=use_pallas)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3)))(
            *args
        )
        return [val, *grads]

    labels = ["val", "dx", "dw", "dmod", "dkmod"]
    want = loss(jnp.float32, False)
    record(
        "adaptive_conv_fused f32 (b8 32x32 256->256 n2, fwd+4 grads)",
        list(zip(labels, loss(jnp.float32, True), want)),
        tol=2e-2,
    )
    # bf16 rounds the INPUTS too, so the tolerance vs the f32 oracle is
    # looser; the point is catching path-specific accumulation blowups
    # (the 1.18 above), not bf16 input rounding
    record(
        "adaptive_conv_fused bf16-vs-f32-oracle",
        list(zip(labels, loss(jnp.bfloat16, True), want)),
        tol=8e-2,
    )
    record(
        "adaptive_conv_xla bf16-vs-f32-oracle",
        list(zip(labels, loss(jnp.bfloat16, False), want)),
        tol=8e-2,
    )


def check_flash_split(l2):
    """Split-heads flash kernel (fwd + vjp) at the G 32x32 self-attn
    shape."""
    b, hh, n, d = 8, 8, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, hh, n, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hh, n, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hh, n, d), jnp.bfloat16)

    def loss(flash):
        def f(q, k, v):
            if flash:
                out = flash_attend(q, k, v, None, l2, None)
            else:
                out = attend(q, k, v, l2_dist=l2, use_flash=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
            q, k, v
        )
        return [val, *grads]

    got, want = loss(True), loss(False)
    record(
        f"flash_attend(b8 h8 n1024 d64, l2={l2}, fwd+3 grads)",
        list(zip(["val", "dq", "dk", "dv"], got, want)),
        tol=3e-2,
    )


def check_flash_fused(l2):
    """Fused-heads kernel + null-KV (fwd + vjp) at the D's batch-expanded
    stage-3 shape (b=48, n=1024, H=8, d=64)."""
    b, n, H, d = 48, 1024, 8, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, n, H * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, n, H * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, n, H * d), jnp.bfloat16)
    null_kv = jax.random.normal(ks[3], (2, H, d), jnp.bfloat16)

    def loss(flash):
        def f(q, k, v, nkv):
            out = attend_fused(q, k, v, heads=H, null_kv=nkv, l2_dist=l2,
                               use_flash=None if flash else False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        if flash:
            def f(q, k, v, nkv):  # noqa: F811 - direct kernel call
                out = flash_attend_fused(q, k, v, nkv, H, l2, None)
                return jnp.sum(out.astype(jnp.float32) ** 2)

        val, grads = jax.jit(
            jax.value_and_grad(f, argnums=(0, 1, 2, 3))
        )(q, k, v, null_kv)
        return [val, *grads]

    got, want = loss(True), loss(False)
    record(
        f"flash_attend_fused(b48 n1024 H8 d64 nullkv, l2={l2}, "
        "fwd+4 grads)",
        list(zip(["val", "dq", "dk", "dv", "dnkv"], got, want)),
        tol=3e-2,
    )


def check_flash_hv(l2):
    """grad-of-jvp kernels (R1 forward-over-reverse structure) on chip."""
    b, hh, n, d = 4, 8, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    q, k, v, tq, tk, tv = (
        jax.random.normal(ks[i], (b, hh, n, d), jnp.bfloat16)
        for i in range(6)
    )

    def hv_loss(flash):
        def f(q, k, v):
            if flash:
                return flash_attend_hv(q, k, v, None, l2, None, True)
            return attend(q, k, v, l2_dist=l2, use_flash=False)

        def s(q, k, v):
            out, tout = jax.jvp(f, (q, k, v), (tq, tk, tv))
            return (jnp.sum(tout.astype(jnp.float32) ** 2)
                    + jnp.sum(out.astype(jnp.float32) ** 3))

        val, grads = jax.jit(jax.value_and_grad(s, argnums=(0, 1, 2)))(
            q, k, v
        )
        return [val, *grads]

    got, want = hv_loss(True), hv_loss(False)
    record(
        f"flash_attend_hv(b4 h8 n512 d64, l2={l2}, jvp+grad-of-jvp)",
        list(zip(["val", "dq", "dk", "dv"], got, want)),
        tol=3e-2,
    )


def check_flash_so(l2):
    """Second-order family: reverse-over-reverse (the default R1 path's
    hand-written adjoint kernel) vs XLA autodiff, fused-heads layout."""
    b, n, H, d = 4, 512, 8, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    q = jax.random.normal(ks[0], (b, n, H * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, n, H * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, n, H * d), jnp.bfloat16)
    null_kv = jax.random.normal(ks[3], (2, H, d), jnp.bfloat16)

    def r1_loss(flash):
        def f(q, k, v, nkv):
            if flash:
                return flash_attend_so(q, k, v, nkv, H, l2, None)
            return attend_fused(q, k, v, heads=H, null_kv=nkv,
                                l2_dist=l2, use_flash=False)

        def inner(q, k, v, nkv):
            return jnp.sum(f(q, k, v, nkv).astype(jnp.float32) ** 2)

        def penalty(q, k, v, nkv):
            gq = jax.grad(inner, argnums=0)(q, k, v, nkv)
            return jnp.sum(gq.astype(jnp.float32) ** 2)

        val, grads = jax.jit(
            jax.value_and_grad(penalty, argnums=(0, 1, 2, 3))
        )(q, k, v, null_kv)
        return [val, *grads]

    got, want = r1_loss(True), r1_loss(False)
    record(
        f"flash_attend_so(b4 n512 H8 d64 nullkv, l2={l2}, "
        "reverse-over-reverse)",
        list(zip(["val", "dq", "dk", "dv", "dnkv"], got, want)),
        tol=5e-2,
    )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    check_adaptive_conv()
    for l2 in (False, True):
        check_flash_split(l2)
        check_flash_fused(l2)
        check_flash_hv(l2)
        check_flash_so(l2)
    out = {
        "device": str(dev),
        "all_ok": all(r["ok"] for r in RESULTS),
        "kernels": RESULTS,
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "VERIFY_KERNELS.json"
    pathlib.Path(out_path).write_text(json.dumps(out, indent=1))
    print(json.dumps({"all_ok": out["all_ok"], "n": len(RESULTS)}))


if __name__ == "__main__":
    main()
