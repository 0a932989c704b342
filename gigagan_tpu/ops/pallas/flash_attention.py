"""Pallas TPU fused attention for GigaGAN's short sequences (≤ ~4k tokens).

XLA materializes the (n, n) similarity and attention matrices in HBM for
both matmuls; at 32x32 feature maps that is ~270MB of traffic per attention
layer.  These kernels keep sim/attn entirely in VMEM: whole K/V per
(batch·head) resident (n_kv·d ≤ 4096·128 fits easily), q processed in row
tiles — no online-softmax machinery needed at these sizes.

Covers the reference's attention variants (attend.py:34-110 +
gigagan_pytorch.py:573-590):
- dot-product similarity
- L2-distance similarity (ViTGAN): sim = -(|q|² + |k|² - 2qk)·scale.  The
  |q|² term is constant per query row, so it cancels in the softmax — the
  kernel computes scale·(2qk - k²), mathematically identical attention.
- key-padding masks (True = attend)

Backward is a SINGLE-PASS custom VJP kernel: the forward saves the row
log-sum-exp (lse), so the backward rebuilds each attention tile with one
exp (no max/sum reductions), computes the softmax-Jacobian contraction with
the standard delta trick (delta = rowsum(g ⊙ out), computed by XLA outside
the kernel), and emits dq per q-tile while dk/dv accumulate in registers
with K/V resident — 5 MXU matmuls total (sim, dattn, dq, dv, dk), versus
7 + two softmax reductions for the previous two-kernel recompute design,
and zero (n, n) HBM traffic versus XLA's materialized backward.
Like the adaptive-conv kernel it is first-order; R1 double-backward paths
trace under `ops.adaptive_conv.pallas_disabled()` and fall back to XLA.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigagan_tpu.ops.pallas.adaptive_conv import pallas_supported

# The flash VJP is FIRST-order (its backward contains raw pallas_calls), so
# R1 double-backward traces must opt out: steps.py wraps the vjp'd D apply
# in `flash_disabled()`.  Separate from the adaptive-conv override — the
# fused convs ARE differentiation-closed and stay on for GP steps.
_FLASH_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "gigagan_flash_override", default=None
)


@contextlib.contextmanager
def flash_disabled():
    token = _FLASH_OVERRIDE.set(False)
    try:
        yield
    finally:
        _FLASH_OVERRIDE.reset(token)


def flash_auto(q, k) -> bool:
    """Default dispatch: the fused kernel on TPU for the sizes where it
    measurably beats XLA (bwd 4.5ms vs 6.1ms at (8,8,1024,64) on v5e —
    DESIGN.md), unless a flash_disabled() trace is active."""
    override = _FLASH_OVERRIDE.get()
    if override is not None:
        return bool(override)
    return (
        pallas_supported()
        and q.shape[-1] <= 128
        and q.shape[-2] >= 1024
        and k.shape[-2] >= 128
    )

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sim_tile(q, k, mask_row, *, l2_dist, scale):
    """(tq, d) x (nk, d) → (tq, nk) fp32 similarity with masking."""
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if l2_dist:
        k_sq = jnp.sum(k.astype(jnp.float32) * k.astype(jnp.float32),
                       axis=-1)
        sim = scale * (2.0 * sim - k_sq[None, :])
    else:
        sim = sim * scale
    return jnp.where(mask_row[None, :], sim, NEG_INF)


def _q_chunks(nq, nk, budget_bytes=2 * 1024 * 1024):
    """q-row chunking so each (chunk, nk) fp32 intermediate fits budget
    (several are live at once in the backward kernels)."""
    rows = max(8, budget_bytes // (nk * 4))
    rows = min(rows, nq)
    while nq % rows != 0:
        rows -= 1
    return rows


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, l2_dist,
                scale, chunk):
    bh = pl.program_id(0)
    k = k_ref[0]
    v = v_ref[0]
    nq = q_ref.shape[1]
    for r0 in range(0, nq, chunk):
        q = q_ref[0, r0 : r0 + chunk]
        sim = _sim_tile(q, k, mask_ref[bh], l2_dist=l2_dist, scale=scale)
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        attn = e / s
        # row log-sum-exp, saved for the single-pass backward
        lse_ref[0, 0, r0 : r0 + chunk] = (m + jnp.log(s))[:, 0]
        o_ref[0, r0 : r0 + chunk] = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, l2_dist, scale, chunk):
    """Single pass: per q-tile rebuild attn from the saved lse (one exp),
    write the dq tile, accumulate dk/dv with K/V resident."""
    bh = pl.program_id(0)
    k = k_ref[0]
    v = v_ref[0]
    mask_row = mask_ref[bh]
    coeff = 2.0 * scale if l2_dist else scale
    nq = q_ref.shape[1]
    nk, d = k.shape

    dv_acc = jnp.zeros((nk, d), jnp.float32)
    dst_q = jnp.zeros((nk, d), jnp.float32)
    col = jnp.zeros((nk, 1), jnp.float32)
    for r0 in range(0, nq, chunk):
        q = q_ref[0, r0 : r0 + chunk]
        g = g_ref[0, r0 : r0 + chunk]
        sim = _sim_tile(q, k, mask_row, l2_dist=l2_dist, scale=scale)
        lse = lse_ref[0, 0, r0 : r0 + chunk]
        attn = jnp.exp(sim - lse[:, None])
        dattn = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # delta trick: rowsum(attn ⊙ dattn) == rowsum(g ⊙ out), precomputed
        delta = delta_ref[0, 0, r0 : r0 + chunk]
        dsim = attn * (dattn - delta[:, None])
        dq = coeff * jax.lax.dot_general(
            dsim.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, r0 : r0 + chunk] = dq.astype(dq_ref.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            attn.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst_q = dst_q + jax.lax.dot_general(
            dsim.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l2_dist:
            col = col + jnp.sum(dsim, axis=0)[:, None]

    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    # dot: dk = scale · dsimᵀ q
    # l2:  dk_j = 2·scale·(Σᵢ dsimᵢⱼ qᵢ − (Σᵢ dsimᵢⱼ)·k_j)
    if l2_dist:
        dk = 2.0 * scale * (dst_q - col * k.astype(jnp.float32))
    else:
        dk = scale * dst_q
    dk_ref[0] = dk.astype(dk_ref.dtype)


def _prep(q, k, v, mask):
    """Fold heads into batch; pad kv length to a lane multiple."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)
    if mask is None:
        mask_bh = jnp.ones((b * h, nk), jnp.bool_)
    else:
        mask_bh = jnp.repeat(mask, h, axis=0)

    nk_pad = _round_up(nk, 128)
    nq_pad = _round_up(nq, 8)
    if nk_pad != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - nk), (0, 0)))
        mask_bh = jnp.pad(mask_bh, ((0, 0), (0, nk_pad - nk)))
    if nq_pad != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    return qf, kf, vf, mask_bh, (b, h, nq, nk, d)


def _qkv_specs(bh, nq, nk, d):
    return [
        pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bh, nk), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attend(q, k, v, mask, l2_dist=False, scale=None, interpret=None):
    """Fused attention; q (b,h,nq,d), k/v (b,h,nk,d), mask (b,nk) or None."""
    out, _, _ = _flash_fwd_impl(q, k, v, mask, l2_dist, scale, interpret)
    return out


def _flash_fwd_impl(q, k, v, mask, l2_dist, scale, interpret):
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf, kf, vf, mask_bh, (b, h, nq, nk, d) = _prep(q, k, v, mask)
    bh, nq_pad, _ = qf.shape
    nk_pad = kf.shape[1]
    chunk = _q_chunks(nq_pad, nk_pad)
    # (bh, 1, nq) with full trailing dims keeps the block TPU-legal (the
    # last two dims must be (8,128)-divisible or equal the array dims)
    row_spec = pl.BlockSpec((1, 1, nq_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, l2_dist=l2_dist, scale=scale,
                          chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d),
        out_specs=(
            pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, mask_bh)
    out_full = out[:, :nq].reshape(b, h, nq, d)
    return out_full, out, lse


def _flash_fwd(q, k, v, mask, l2_dist, scale, interpret):
    out_full, out_flat, lse = _flash_fwd_impl(
        q, k, v, mask, l2_dist, scale, interpret
    )
    return out_full, (q, k, v, mask, out_flat, lse)


def _flash_bwd(l2_dist, scale, interpret, residuals, g):
    q, k, v, mask, out_flat, lse = residuals
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qf, kf, vf, mask_bh, (b, h, nq, nk, d) = _prep(q, k, v, mask)
    bh, nq_pad, _ = qf.shape
    nk_pad = kf.shape[1]
    gf = g.reshape(bh, nq, d)
    if nq_pad != nq:
        gf = jnp.pad(gf, ((0, 0), (0, nq_pad - nq), (0, 0)))
    gf = gf.astype(qf.dtype)
    # delta trick: rowsum(attn ⊙ dattn) == rowsum(g ⊙ out) — cheap XLA
    # elementwise+reduce, fused with the surrounding graph
    delta = jnp.sum(
        gf.astype(jnp.float32) * out_flat.astype(jnp.float32), axis=-1
    )[:, None, :]

    chunk = _q_chunks(nq_pad, nk_pad)
    row_spec = pl.BlockSpec((1, 1, nq_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    qtile_spec = pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    kvtile_spec = pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, l2_dist=l2_dist, scale=scale,
                          chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d)
        + [qtile_spec, row_spec, row_spec],
        out_specs=(qtile_spec, kvtile_spec, kvtile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), qf.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, mask_bh, gf, lse, delta)

    dq = dq[:, :nq].reshape(b, h, nq, d).astype(q.dtype)
    dk = dk[:, :nk].reshape(b, h, nk, d).astype(k.dtype)
    dv = dv[:, :nk].reshape(b, h, nk, d).astype(v.dtype)
    # bool mask cotangent is float0
    dmask = (
        None if mask is None
        else np.zeros(mask.shape, dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, dmask


flash_attend.defvjp(_flash_fwd, _flash_bwd)
