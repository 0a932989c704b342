"""Fused-heads Pallas attention: operands stay in the network's native
`(b, n, heads·d)` layout end to end.

Motivation (round-3 device trace, v5e): the `(b, x, y, h·d) → (b, h, n, d)`
einops relayouts around every attention, the null-KV concat, and the
1025→1152 lane padding cost ~15ms of the 123ms no-GP iteration — more than
the attention math itself.  This kernel eliminates ALL of it:

- q/k/v/out are `(b, n, heads·d)` — exactly what the 1×1 projections
  produce and consume; the grid is `(batch, head-group)` where a head
  group is `lcm(128, d)/d` heads, so every block's lane extent is a
  128 multiple and all Ref loads/stores are full-block (Mosaic rejects
  sub-128 lane blocking and strided sub-lane stores).
- the learned null KV (reference gigagan_pytorch.py:534,564-569) is
  handled ANALYTICALLY as one extra logit column per row — no concat, no
  (nk+1)→lane-multiple pad, no masked tail; its math is rank-1 VPU work
  (Mosaic rejects 1-row MXU contractions with mixed dtypes).
- per-head outputs within a group are assembled with value-level
  `concatenate` along lanes so stores stay full-width.

Same single-pass backward design as ops/pallas/flash_attention.py (saved
row log-sum-exp, delta in-kernel, K/V-resident dk/dv accumulation), with
two extra tiny outputs for the null-KV gradients.  Like its sibling it is
FIRST-order: R1 double-backward traces run under `flash_disabled()` on the
XLA fallback inside `ops.attention.attend_fused`.

Supported: no key-padding mask (the fused callers — G/D SelfAttention and
the upsampler's Attention2D — never mask; masked cross/text attention runs
at ≤77 tokens where flash is off anyway), d ≤ 128, and the head-group size
must divide `heads` (else `attend_fused` falls back to the split-heads
path).
"""

from __future__ import annotations

import functools
import math
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigagan_tpu.ops.pallas.adaptive_conv import pallas_supported
from gigagan_tpu.ops.pallas.flash_attention import (
    NEG_INF,
    _q_chunks,
    _round_up,
)


# q-chunk VMEM budgets (bytes per (chunk, nk) fp32 intermediate, divided
# by the head-group width); module-level so scripts/bench_so.py-style
# sweeps can tune them on hardware.
_FWD_BUDGET = int(_os.environ.get("GIGAGAN_FA_FWD_BUDGET",
                                  8 * 1024 * 1024))


def mosaic_params():
    """Shared Mosaic compiler params for the flash family.  Mosaic's
    default scoped-VMEM limit is 16M — tight enough that the round-3
    budget sweep had to stop at chunk sizes well below the kernels'
    bandwidth sweet spots.  Raising the per-kernel limit to 64M (v5e has
    128M physical VMEM) let the round-5 sweep double every chunk budget:
    the second-order adjoint dropped 15.3 → 11.9 ms and the fused
    backward 7.3 → 6.7 ms at the D's batch-expanded (48, 1024, 8, 64)
    shape; 96M was flat vs 64M.  The client-side XLA_FLAGS parser
    rejects --xla_tpu_scoped_vmem_limit_kib under the remote-compile
    relay, so pltpu.CompilerParams is the only working channel.
    GIGAGAN_PALLAS_VMEM_LIMIT overrides; 0 restores the Mosaic default."""
    lim = int(_os.environ.get("GIGAGAN_PALLAS_VMEM_LIMIT",
                              64 * 1024 * 1024))
    if lim <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=lim)


def head_group(heads: int, d: int):
    """Heads per grid step so the lane extent (hg·d) is a 128 multiple;
    None when no legal grouping exists (caller falls back to the
    split-heads paths).  Groups wider than 2 (d < 64) are rejected: the
    Mosaic stack allocator keeps every unrolled head's (chunk, nk) fp32
    intermediates live and exceeds VMEM (measured 18.4M at hg=4,
    n=1024 on v5e) — those geometries (the upsampler's dim_head-32
    Attention2D) keep the round-2 split-heads flash kernel instead."""
    if d > 128:
        return None
    hg = math.lcm(128, d) // d
    if heads % hg != 0 or hg > 2:
        return None
    return hg


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, nullk_ref, nullv_ref,
                nullb_ref, o_ref, lse_ref, *, hg, d, chunk, have_null):
    q_all = q_ref[0]          # (nq, hg·d)
    k_all = k_ref[0]          # k_pre = coeff·k
    v_all = v_ref[0]
    bias = bias_ref[0, 0]     # (hg, nk) fp32: -scale·|k|² (l2) + pad mask
    nq = q_all.shape[0]
    for r0 in range(0, nq, chunk):
        outs = []
        lses = []
        for h in range(hg):
            lo = h * d
            qc = q_all[r0 : r0 + chunk, lo : lo + d]
            kh = k_all[:, lo : lo + d]
            vh = v_all[:, lo : lo + d]
            sim = jax.lax.dot_general(
                qc, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias[h : h + 1, :]
            if have_null:
                # the null token is ONE analytic extra logit per row
                sim_n = jnp.sum(
                    qc.astype(jnp.float32)
                    * nullk_ref[0, h : h + 1, :].astype(jnp.float32),
                    axis=-1, keepdims=True,
                ) + nullb_ref[0, h : h + 1, :]
                m = jnp.maximum(
                    jnp.max(sim, axis=-1, keepdims=True), sim_n
                )
                e = jnp.exp(sim - m)
                en = jnp.exp(sim_n - m)
                s = jnp.sum(e, axis=-1, keepdims=True) + en
                av = jax.lax.dot_general(
                    e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + en * nullv_ref[0, h : h + 1, :].astype(jnp.float32)
            else:
                m = jnp.max(sim, axis=-1, keepdims=True)
                e = jnp.exp(sim - m)
                s = jnp.sum(e, axis=-1, keepdims=True)
                av = jax.lax.dot_general(
                    e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            outs.append((av / s).astype(o_ref.dtype))
            lses.append((m + jnp.log(s))[:, 0])
        o_ref[0, r0 : r0 + chunk, :] = jnp.concatenate(outs, axis=-1)
        lse_ref[0, 0, :, r0 : r0 + chunk] = jnp.stack(lses, axis=0)


def _prep_fused(q, k, v, null_kv, heads, hg, l2_dist, scale):
    """XLA-side operand prep (fuses with the producing projections):
    k_pre = coeff·k; per-(b, group, head) fp32 bias row −scale·|k|²
    (+NEG_INF on lane padding); null k_pre / v / bias rows grouped."""
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    hb = heads // hg
    coeff = 2.0 * scale if l2_dist else scale
    k_pre = (k.astype(jnp.float32) * coeff).astype(k.dtype)
    if l2_dist:
        # |k|² per (b, head, key) with fp32 ACCUMULATION directly off the
        # bf16 operand — never materializes an fp32 copy of k (16MB at the
        # D's batch-64 32² attention; measured ~1.2ms/iter)
        kh = k.reshape(b, nk, heads, d)
        bias = -scale * jnp.einsum(
            "bkhd,bkhd->bhk", kh, kh,
            preferred_element_type=jnp.float32,
        )
    else:
        bias = jnp.zeros((b, heads, nk), jnp.float32)

    nk_pad = _round_up(nk, 128)
    nq_pad = _round_up(nq, 8)
    if nk_pad != nk:
        k_pre = jnp.pad(k_pre, ((0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, nk_pad - nk)),
                       constant_values=NEG_INF)
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    bias = bias.reshape(b, hb, hg, nk_pad)

    if null_kv is not None:
        nullk_raw = null_kv[0].astype(jnp.float32)         # (H, d)
        nullk_pre = (nullk_raw * coeff).astype(k.dtype)
        nullv = null_kv[1].astype(v.dtype)
        if l2_dist:
            null_bias = -scale * jnp.sum(
                nullk_raw * nullk_raw, axis=-1, keepdims=True
            )                                              # (H, 1)
        else:
            null_bias = jnp.zeros((heads, 1), jnp.float32)
    else:
        nullk_pre = jnp.zeros((heads, d), k.dtype)
        nullv = jnp.zeros((heads, d), v.dtype)
        null_bias = jnp.zeros((heads, 1), jnp.float32)
    nullk_pre = nullk_pre.reshape(hb, hg, d)
    nullv = nullv.reshape(hb, hg, d)
    null_bias = null_bias.reshape(hb, hg, 1)
    return (q, k_pre, v, bias, nullk_pre, nullv, null_bias,
            (b, nq, nk, d, hb), coeff)


def _specs(nq, nk, hg, d):
    w = hg * d
    return [
        pl.BlockSpec((1, nq, w), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, w), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, w), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hg, nk), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, d), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, d), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, 1), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attend_fused(q, k, v, null_kv, heads, l2_dist=False, scale=None,
                       interpret=None):
    """Fused-heads attention: q (b, nq, H·d), k/v (b, nk, H·d),
    null_kv (2, H, d) or None → (b, nq, H·d)."""
    out, _ = _fwd_impl(q, k, v, null_kv, heads, l2_dist, scale, interpret)
    return out


def _fwd_impl(q, k, v, null_kv, heads, l2_dist, scale, interpret):
    interpret = (not pallas_supported()) if interpret is None else interpret
    d_head = q.shape[-1] // heads
    if scale is None:
        scale = d_head ** -0.5
    # interpret mode has no lane-tiling constraints: any grouping works
    hg = head_group(heads, d_head) or (heads if interpret else None)
    assert hg is not None, "caller must gate on head_group()"
    b, nq, hd = q.shape
    (qp, k_pre, vp, bias, nullk_pre, nullv, null_bias,
     (_, nq0, nk0, d, hb), _) = _prep_fused(
        q, k, v, null_kv, heads, hg, l2_dist, scale
    )
    nq_pad, nk_pad = qp.shape[1], k_pre.shape[1]
    # q-chunk sizing: the head-group loop keeps ~hg (chunk, nk) fp32
    # intermediates live per step, so the budget scales inversely with
    # the group size (4MB/hg fits the hg≤2 gate; hg=8 OOMed at 16.2M)
    chunk = _q_chunks(nq_pad, nk_pad, budget_bytes=_FWD_BUDGET // hg)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, hg=hg, d=d, chunk=chunk,
            have_null=null_kv is not None,
        ),
        grid=(b, hb),
        in_specs=_specs(nq_pad, nk_pad, hg, d),
        out_specs=(
            pl.BlockSpec((1, nq_pad, hg * d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hg, nq_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, hb, hg, nq_pad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(qp, k_pre, vp, bias, nullk_pre, nullv, null_bias)
    return out[:, :nq0], (out, lse)


def _fwd_rule(q, k, v, null_kv, heads, l2_dist, scale, interpret):
    out, (_, lse) = _fwd_impl(
        q, k, v, null_kv, heads, l2_dist, scale, interpret
    )
    return out, (q, k, v, null_kv, lse)


def _bwd_rule(heads, l2_dist, scale, interpret, residuals, g):
    # Grid-chunked single-pass backward shared with the second-order
    # family: measured ~20% faster than the former in-kernel-loop layout
    # at the D's stage-3 shape (Mosaic pipelines real grid steps better
    # than an unrolled chunk loop), and it needs no saved `out` residual
    # (delta = rowsum(attn * dattn) equals rowsum(g * out) exactly).
    q, k, v, null_kv, lse = residuals
    from gigagan_tpu.ops.pallas.flash_attention_so import _bwd_sc_impl

    return _bwd_sc_impl(q, k, v, null_kv, g, lse, heads, l2_dist, scale,
                        interpret)


flash_attend_fused.defvjp(_fwd_rule, _bwd_rule)
