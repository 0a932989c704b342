"""Second-order flash attention for the R1 gradient penalty.

The base flash kernels (flash_attention.py) are first-order: their VJP is a
raw Pallas kernel, so any graph that differentiates THROUGH an attention
gradient (the R1 penalty's ∇θ‖∇ₓD‖²) must fall back to XLA attention, which
materializes (n, n) maps in HBM and dominates the GP step (~70ms/iter of a
236ms GP iteration on v5e after every XLA-side trick).

This module closes the gap for the forward-over-reverse R1 formulation
(steps.py: ∇θ GP = ∇θ 2⟨∇ₓφ, sg(∇ₓφ)⟩, the classic grad-of-jvp hvp):

- `flash_attend_hv` is a `jax.custom_jvp` whose JVP rule calls ONE fused
  Pallas kernel J producing (out, tout) — primal attention and its tangent
  along the input tangents — with sim/tsim resident in VMEM.
- J is itself a `jax.custom_vjp` pair whose backward is ONE kernel S
  emitting cotangents for all six operands (the softmax Jacobian and the
  tangent-softmax Jacobian, 13 MXU matmuls per q-tile, zero (n, n) HBM).
- grad-of-jvp needs no transposition: the tangents are stop-gradient
  constants, so the outer reverse pass sees J as a regular custom_vjp call.

Math (per batch·head; k̂ = coeff·k, bias = −scale·|k|² + mask fold, so the
|q|² term cancels in softmax — see flash_attention.py):
  sim = q k̂ᵀ + bias              T (=tsim) = tq k̂ᵀ + q t̂kᵀ + tbias
  A = softmax(sim)               mu = rowsum(A⊙T)
  out = A v                      tout = (A⊙(T − mu)) v + A tv
Backward of (out, tout) w.r.t. (q, k̂, v, tq, t̂k, tv, bias, tbias), with
r = rowsum(A⊙ĝtA):
  ĝtA = ĝt vᵀ
  ĝA  = ĝo vᵀ + ĝt tvᵀ + ĝtA⊙(T − mu) − T⊙r
  ĝT  = A⊙(ĝtA − r)
  ĝsim = A⊙(ĝA − rowsum(A⊙ĝA))
  ĝq = ĝsim k̂ + ĝT t̂k     ĝk̂ = ĝsimᵀ q + ĝTᵀ tq     ĝtq = ĝT k̂
  ĝt̂k = ĝTᵀ q             ĝv = Aᵀ ĝo + (A⊙(T−mu))ᵀ ĝt   ĝtv = Aᵀ ĝt
  ĝbias = colsum(ĝsim)     ĝtbias = colsum(ĝT)
The k̂/bias (and t̂k/tbias) chain rules back to raw k/tk are cheap XLA ops
in the wrapper.
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
from gigagan_tpu.ops.pallas.flash_attention import (
    _prep,
    _q_chunks,
    _qkv_specs,
)


# When set, `ops.attend` routes flash-eligible calls to `flash_attend_hv`
# so the trace supports grad-of-jvp.  The GP surrogate's φ sets it
# (steps.py); `flash_disabled()` still wins (flash_auto returns False).
_HV_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "gigagan_flash_hv", default=False
)


@contextlib.contextmanager
def flash_hv_mode():
    token = _HV_MODE.set(True)
    try:
        yield
    finally:
        _HV_MODE.reset(token)


def _jvp_kernel(q_ref, k_ref, v_ref, bias_ref, tq_ref, tk_ref, tv_ref,
                tbias_ref, o_ref, to_ref, lse_ref, *, chunk):
    k = k_ref[0]    # k̂ = coeff·k
    v = v_ref[0]
    tk = tk_ref[0]  # t̂k = coeff·tk
    tv = tv_ref[0]
    bias = bias_ref[0]       # (1, nk) fp32
    tbias = tbias_ref[0]
    nq = q_ref.shape[1]
    mm = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    NT = (((1,), (1,)), ((), ()))  # x yᵀ
    NN = (((1,), (0,)), ((), ()))  # x y
    for r0 in range(0, nq, chunk):
        sl = slice(r0, r0 + chunk)
        q = q_ref[0, sl]
        tq = tq_ref[0, sl]
        sim = mm(q, k, NT) + bias
        t_sim = mm(tq, k, NT) + mm(q, tk, NT) + tbias
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        a = e / s
        lse_ref[0, 0, sl] = (m + jnp.log(s))[:, 0]
        o_ref[0, sl] = mm(a.astype(v.dtype), v, NN).astype(o_ref.dtype)
        mu = jnp.sum(a * t_sim, axis=-1, keepdims=True)
        ta = a * (t_sim - mu)
        tout = mm(ta.astype(v.dtype), v, NN) + mm(
            a.astype(tv.dtype), tv, NN
        )
        to_ref[0, sl] = tout.astype(to_ref.dtype)


def _jvp_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, tq_ref, tk_ref, tv_ref,
                    tbias_ref, lse_ref, go_ref, gt_ref,
                    gq_ref, gk_ref, gv_ref, gbias_ref, gtq_ref, gtk_ref,
                    gtv_ref, gtbias_ref, *, chunk):
    k = k_ref[0]
    v = v_ref[0]
    tk = tk_ref[0]
    tv = tv_ref[0]
    bias = bias_ref[0]
    tbias = tbias_ref[0]
    nq = q_ref.shape[1]
    nk, d = k.shape
    mm = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    NT = (((1,), (1,)), ((), ()))
    NN = (((1,), (0,)), ((), ()))
    TN = (((0,), (0,)), ((), ()))  # xᵀ y

    gk_acc = jnp.zeros((nk, d), jnp.float32)
    gtk_acc = jnp.zeros((nk, d), jnp.float32)
    gv_acc = jnp.zeros((nk, d), jnp.float32)
    gtv_acc = jnp.zeros((nk, d), jnp.float32)
    gbias_acc = jnp.zeros((1, nk), jnp.float32)
    gtbias_acc = jnp.zeros((1, nk), jnp.float32)
    for r0 in range(0, nq, chunk):
        sl = slice(r0, r0 + chunk)
        q = q_ref[0, sl]
        tq = tq_ref[0, sl]
        go = go_ref[0, sl]
        gt = gt_ref[0, sl]
        lse = lse_ref[0, 0, sl]
        sim = mm(q, k, NT) + bias
        a = jnp.exp(sim - lse[:, None])
        t_sim = mm(tq, k, NT) + mm(q, tk, NT) + tbias
        mu = jnp.sum(a * t_sim, axis=-1, keepdims=True)
        t_cent = t_sim - mu
        ta = a * t_cent

        gta = mm(gt, v, NT)
        r = jnp.sum(a * gta, axis=-1, keepdims=True)
        ga = (
            mm(go, v, NT) + mm(gt, tv, NT)
            + gta * t_cent - t_sim * r
        )
        gT = a * (gta - r)
        gsim = a * (ga - jnp.sum(a * ga, axis=-1, keepdims=True))

        gq = mm(gsim.astype(k.dtype), k, NN) + mm(
            gT.astype(tk.dtype), tk, NN
        )
        gq_ref[0, sl] = gq.astype(gq_ref.dtype)
        gtq_ref[0, sl] = mm(gT.astype(k.dtype), k, NN).astype(
            gtq_ref.dtype
        )
        gk_acc = gk_acc + mm(gsim.astype(q.dtype), q, TN) + mm(
            gT.astype(tq.dtype), tq, TN
        )
        gtk_acc = gtk_acc + mm(gT.astype(q.dtype), q, TN)
        gv_acc = gv_acc + mm(a.astype(go.dtype), go, TN) + mm(
            ta.astype(gt.dtype), gt, TN
        )
        gtv_acc = gtv_acc + mm(a.astype(gt.dtype), gt, TN)
        gbias_acc = gbias_acc + jnp.sum(gsim, axis=0)[None, :]
        gtbias_acc = gtbias_acc + jnp.sum(gT, axis=0)[None, :]

    gk_ref[0] = gk_acc.astype(gk_ref.dtype)
    gtk_ref[0] = gtk_acc.astype(gtk_ref.dtype)
    gv_ref[0] = gv_acc.astype(gv_ref.dtype)
    gtv_ref[0] = gtv_acc.astype(gtv_ref.dtype)
    gbias_ref[0] = gbias_acc
    gtbias_ref[0] = gtbias_acc


def _prep_tangents(q, k, tq, tk, mask, l2_dist, scale):
    """Tangent-side operands matching _prep's folding: t̂k = coeff·tk and
    tbias = −2·scale·rowsum(k⊙tk) (zero under the mask — masked positions
    keep bias = NEG_INF regardless of tangents)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    coeff = 2.0 * scale if l2_dist else scale
    tqf = tq.reshape(b * h, nq, d)
    tkf = tk.reshape(b * h, nk, d)
    tk_pre = (tkf.astype(jnp.float32) * coeff).astype(tkf.dtype)
    if l2_dist:
        prod = (
            k.reshape(b * h, nk, d).astype(jnp.float32)
            * tkf.astype(jnp.float32)
        )
        tbias = -2.0 * scale * jnp.sum(prod, axis=-1)  # (bh, nk)
    else:
        tbias = jnp.zeros((b * h, nk), jnp.float32)
    if mask is not None:
        tbias = jnp.where(jnp.repeat(mask, h, axis=0), tbias, 0.0)
    return tqf, tk_pre, tbias[:, None, :]


def _pad_rows(t, nq_pad):
    if t.shape[1] != nq_pad:
        t = jnp.pad(t, ((0, 0), (0, nq_pad - t.shape[1]), (0, 0)))
    return t


def _pad_kv(t, nk_pad):
    if t.shape[1] != nk_pad:
        t = jnp.pad(t, ((0, 0), (0, nk_pad - t.shape[1]), (0, 0)))
    return t


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _attend_jvp_pair(q, k, v, tq, tk, tv, mask, l2_dist, scale, interpret):
    out, tout, _ = _jvp_impl(q, k, v, tq, tk, tv, mask, l2_dist, scale,
                             interpret)
    return out, tout


def _hv_operands(q, k, v, tq, tk, tv, mask, l2_dist, scale):
    qf, k_pre, vf, bias, dims, coeff = _prep(q, k, v, mask, l2_dist, scale)
    b, h, nq, nk, d = dims
    tqf, tk_pre, tbias = _prep_tangents(q, k, tq, tk, mask, l2_dist, scale)
    tvf = tv.reshape(b * h, nk, d)
    nq_pad, nk_pad = qf.shape[1], k_pre.shape[1]
    tk_pre = _pad_kv(tk_pre, nk_pad)
    tvf = _pad_kv(tvf, nk_pad)
    if tbias.shape[-1] != nk_pad:
        tbias = jnp.pad(
            tbias, ((0, 0), (0, 0), (0, nk_pad - tbias.shape[-1]))
        )
    tqf = _pad_rows(tqf, nq_pad)
    return (qf, k_pre, vf, bias, tqf, tk_pre, tvf, tbias, dims, coeff,
            nq_pad, nk_pad)


def _jvp_impl(q, k, v, tq, tk, tv, mask, l2_dist, scale, interpret):
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    (qf, k_pre, vf, bias, tqf, tk_pre, tvf, tbias,
     (b, h, nq, nk, d), _, nq_pad, nk_pad) = _hv_operands(
        q, k, v, tq, tk, tv, mask, l2_dist, scale
    )
    chunk = _q_chunks(nq_pad, nk_pad)
    bh = b * h
    tile = lambda n: pl.BlockSpec(  # noqa: E731
        (1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row = lambda n: pl.BlockSpec(  # noqa: E731
        (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out, tout, lse = pl.pallas_call(
        functools.partial(_jvp_kernel, chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d)
        + [tile(nq_pad), tile(nk_pad), tile(nk_pad), row(nk_pad)],
        out_specs=(tile(nq_pad), tile(nq_pad), row(nq_pad)),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, k_pre, vf, bias, tqf, tk_pre, tvf, tbias)
    shape = (b, h, nq, d)
    return (
        out[:, :nq].reshape(shape),
        tout[:, :nq].reshape(shape),
        lse,
    )


def _pair_fwd(q, k, v, tq, tk, tv, mask, l2_dist, scale, interpret):
    out, tout, lse = _jvp_impl(q, k, v, tq, tk, tv, mask, l2_dist, scale,
                               interpret)
    return (out, tout), (q, k, v, tq, tk, tv, mask, lse)


def _pair_bwd(l2_dist, scale, interpret, residuals, cots):
    q, k, v, tq, tk, tv, mask, lse = residuals
    go, gt = cots
    interpret = (not pallas_supported()) if interpret is None else interpret
    if scale is None:
        scale = q.shape[-1] ** -0.5
    coeff = 2.0 * scale if l2_dist else scale
    (qf, k_pre, vf, bias, tqf, tk_pre, tvf, tbias,
     (b, h, nq, nk, d), _, nq_pad, nk_pad) = _hv_operands(
        q, k, v, tq, tk, tv, mask, l2_dist, scale
    )
    gof = _pad_rows(go.reshape(b * h, nq, d).astype(qf.dtype), nq_pad)
    gtf = _pad_rows(gt.reshape(b * h, nq, d).astype(qf.dtype), nq_pad)
    # ~6 (chunk, nk) fp32 intermediates live at once
    chunk = _q_chunks(nq_pad, nk_pad, budget_bytes=1024 * 1024)
    bh = b * h
    tile = lambda n: pl.BlockSpec(  # noqa: E731
        (1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    row = lambda n: pl.BlockSpec(  # noqa: E731
        (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gq, gk_pre, gv, gbias, gtq, gtk_pre, gtv, gtbias = pl.pallas_call(
        functools.partial(_jvp_bwd_kernel, chunk=chunk),
        grid=(bh,),
        in_specs=_qkv_specs(bh, nq_pad, nk_pad, d)
        + [tile(nq_pad), tile(nk_pad), tile(nk_pad), row(nk_pad),
           row(nq_pad), tile(nq_pad), tile(nq_pad)],
        out_specs=(
            tile(nq_pad), tile(nk_pad), tile(nk_pad), row(nk_pad),
            tile(nq_pad), tile(nk_pad), tile(nk_pad), row(nk_pad),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(vf.shape, jnp.float32),
            jax.ShapeDtypeStruct(vf.shape, qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nk_pad), jnp.float32),
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(vf.shape, jnp.float32),
            jax.ShapeDtypeStruct(vf.shape, qf.dtype),
            jax.ShapeDtypeStruct((bh, 1, nk_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, k_pre, vf, bias, tqf, tk_pre, tvf, tbias, lse, gof, gtf)

    # un-fold k̂ = coeff·k, bias = −scale·|k|², tbias = −2·scale·Σ k⊙tk
    # (all k-sized XLA ops)
    k32 = k.astype(jnp.float32)
    tk32 = tk.astype(jnp.float32)
    gk32 = coeff * gk_pre[:, :nk].reshape(b, h, nk, d).astype(jnp.float32)
    gtk32 = coeff * gtk_pre[:, :nk].reshape(b, h, nk, d).astype(
        jnp.float32
    )
    if l2_dist:
        gb = gbias[:, 0, :nk].reshape(b, h, nk)
        gtb = gtbias[:, 0, :nk].reshape(b, h, nk)
        if mask is not None:
            gb = jnp.where(mask[:, None, :], gb, 0.0)
            gtb = jnp.where(mask[:, None, :], gtb, 0.0)
        gk32 = gk32 - 2.0 * scale * (
            gb[..., None] * k32 + gtb[..., None] * tk32
        )
        gtk32 = gtk32 - 2.0 * scale * gtb[..., None] * k32

    gq = gq[:, :nq].reshape(b, h, nq, d).astype(q.dtype)
    gtq = gtq[:, :nq].reshape(b, h, nq, d).astype(q.dtype)
    gk = gk32.astype(k.dtype)
    gtk = gtk32.astype(k.dtype)
    gv = gv[:, :nk].reshape(b, h, nk, d).astype(v.dtype)
    gtv = gtv[:, :nk].reshape(b, h, nk, d).astype(v.dtype)
    dmask = (
        None if mask is None
        else np.zeros(mask.shape, dtype=jax.dtypes.float0)
    )
    return gq, gk, gv, gtq, gtk, gtv, dmask


_attend_jvp_pair.defvjp(_pair_fwd, _pair_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def flash_attend_hv(q, k, v, mask=None, l2_dist=False, scale=None,
                    interpret=None):
    """Flash attention that supports grad-of-jvp (hvp) — the R1
    forward-over-reverse path.  Primal = the fused forward; jvp = the J
    kernel; reverse of the jvp = the S kernel."""
    from gigagan_tpu.ops.pallas.flash_attention import flash_attend

    return flash_attend(q, k, v, mask, l2_dist, scale, interpret)


@flash_attend_hv.defjvp
def _hv_jvp(mask, l2_dist, scale, interpret, primals, tangents):
    q, k, v = primals
    tq, tk, tv = tangents
    out, tout = _attend_jvp_pair(q, k, v, tq, tk, tv, mask,
                                 l2_dist, scale, interpret)
    return out, tout
