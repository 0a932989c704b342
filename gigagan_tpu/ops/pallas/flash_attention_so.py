"""Second-order (differentiation-closed) fused-heads flash attention for the
reverse-over-reverse R1 gradient penalty.

The default R1 formulation (steps.py, torch-create_graph equivalent,
reference gigagan_pytorch.py:2357-2372) differentiates THROUGH the D
backward.  The first-order flash kernels must therefore drop out of the GP
trace (`flash_disabled()`), and the D's 32² self-attention at multiscale
batch 64/128 falls back to XLA, which materializes (b, h, n, n) maps in HBM
for the double-backward — ~75ms of the 228ms GP iteration on v5e after
every XLA-side trick (DESIGN.md).

This module closes attention under REVERSE-mode differentiation to second
order, in the fused-heads `(b, n, H·d)` layout of
ops/pallas/flash_attention_fused.py:

- `flash_attend_so` wraps `_so_fwd_op`, a `jax.custom_vjp` returning
  (out, lse) whose residuals are the primal inputs + the saved lse; its
  backward calls `flash_bwd_so`.
- `flash_bwd_so(q, k, v, null_kv, g, lse) -> (dq, dk, dv, dnull)` is
  itself a `jax.custom_vjp`: the primal is a single-pass backward kernel
  (row softmax reconstructed from the SAVED lse — attn = exp(sim − lse) —
  one exp pass instead of a max/sum/divide recompute), and its backward is
  ONE adjoint kernel emitting cotangents for all operands — the full
  second derivative of softmax attention (12 MXU matmuls per q-chunk per
  head, zero (n, n) HBM traffic).  The lse cotangent is structurally zero:
  the hand-written adjoint formulas below are the derivative of the REAL
  softmax (normalizer included), so the saved value carries no independent
  sensitivity — the standard flash-attention residual argument.

Reverse-over-reverse closure works because `jax.vjp` inlines the bwd rule's
operations into the cotangent jaxpr: the outer `jax.grad` then needs only
the (first-order) VJP of `flash_bwd_so`, which this module provides.  Like
the rest of the family it is NOT jvp-capable (forward-over-reverse uses
ops/pallas/flash_attention_hv.py instead).

Adjoint math (per batch·head; c = coeff = 2·scale for L2-distance else
scale; k̂ = c·k; β = −scale·|k|² folded XLA-side; null token is one
analytic extra logit column n):
  forward   S = q k̂ᵀ + β          P = softmax([S, Sⁿ])      O = P V (+ Pⁿ n_v)
  backward  dA = G Vᵀ             δ = rowsum(P⊙dA) (+ Pⁿ dAⁿ)
            dS = P⊙(dA − δ)       dQ = c·dS K,  dK = c·(dSᵀQ − u⊙K),
            dV = Pᵀ G             u = colsum(dS)   (u-term L2 only)
  adjoint, given cotangents Ã (dQ), B̃ (dK), C̃ (dV):
            c_dS = c·(Ã Kᵀ + Q B̃ᵀ) − c·⟨B̃ⱼ, kⱼ⟩           (last term L2)
            c_T  = c_dS⊙P          c_δ = −rowsum(c_T)
            c_dA = c_T + c_δ⊙P
            c_P  = c_dS⊙(dA − δ) + G C̃ᵀ + c_δ⊙dA
            c_S  = P⊙(c_P − rowsum(P⊙c_P))
            c_Q  = c·(dS B̃ + c_S K)
            c_K  = c·(dSᵀÃ + c_SᵀQ) − u⊙(c·B̃) − colsum(c_S)⊙k̂   (L2 tail)
            c_V  = c_dAᵀ G          c_G = c_dA V + P C̃
with the null column carried through every row statistic (δ, c_δ, rowsum
normalizers) as rank-1 VPU work.

Kernel structure: grid (batch, head-group, q-chunk) with the q-chunk as a
REAL grid dimension — an in-kernel unrolled chunk loop made Mosaic's stack
allocator keep every iteration's temporaries live simultaneously
(scoped-VMEM OOM: 25-62M vs the 16M limit at the D's batch-64 n=1024
attention, worse at SMALLER chunks).  Key-side gradient accumulators live
in VMEM scratch across the q-chunk grid steps (zeroed at qi == 0, flushed
to the key-shaped outputs at qi == last); q-shaped outputs stream per
step.

Eligibility mirrors the fused kernel (head_group, d ≤ 128, no key-padding
mask) plus nq % 8 == 0 (all feature-map attentions: n = h·w).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigagan_tpu.ops.pallas.adaptive_conv import pallas_supported
from gigagan_tpu.ops.pallas.flash_attention import _q_chunks, flash_auto
from gigagan_tpu.ops.pallas.flash_attention_fused import mosaic_params
from gigagan_tpu.ops.pallas.flash_attention_fused import (
    _fwd_impl,
    _prep_fused,
    head_group,
)

# When set, `ops.attend_fused` routes flash-eligible calls to
# `flash_attend_so` (and `ops.attend` falls back to XLA) so the whole trace
# is closed under second-order reverse differentiation.  steps.py's
# reverse-over-reverse GP branches set it.
_SO_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "gigagan_flash_so", default=False
)


@contextlib.contextmanager
def flash_so_mode():
    token = _SO_MODE.set(True)
    try:
        yield
    finally:
        _SO_MODE.reset(token)


def flash_so_auto(q, k, heads: int) -> bool:
    """attend_fused dispatch gate for the second-order kernels: SO trace
    active + the fused-kernel geometry + the usual flash size gate."""
    if not _SO_MODE.get():
        return False
    d = q.shape[-1] // heads
    if head_group(heads, d) is None:
        return False
    if q.shape[-2] % 8 != 0:
        return False
    # flash_auto also honors flash_disabled() and the GIGAGAN_FLASH env
    # override (probes are (..., n, d)-shaped views)
    return flash_auto(q[..., :d], k[..., :d])


# q-chunk VMEM budgets (bytes per (chunk, nk) fp32 intermediate, divided by
# the head-group width).  Module-level so scripts/bench_so.py can sweep
# them.  Swept on v5e at the D's stage-3 shape (b=48, n=1024, H=8, d=64):
# bwd_sc 6.9 → 4.5ms at 4M (chunk 512; 8M = whole-nq chunks OOMs scoped
# VMEM at 22.3M/16M), bwd2 20.9 → 12.1ms at 1M (chunk 128; 2M OOMs — the
# adjoint holds ~14 live (chunk, nk) fp32 temporaries per unrolled head).
# defaults re-swept in round 5 under the raised 64M per-kernel VMEM
# limit (mosaic_params in flash_attention_fused.py); at the old 16M
# Mosaic default the sweet spots were 4M/1M (2M already OOMed scoped
# VMEM for the adjoint's ~14 live (chunk, nk) fp32 temporaries)
_BWD_BUDGET = int(_os.environ.get("GIGAGAN_SO_BWD_BUDGET",
                                  8 * 1024 * 1024))
_BWD2_BUDGET = int(_os.environ.get("GIGAGAN_SO_BWD2_BUDGET",
                                   4 * 1024 * 1024))

_NT = (((1,), (1,)), ((), ()))  # x yᵀ  (contract last dims)
_NN = (((1,), (0,)), ((), ()))  # x y
_TN = (((0,), (0,)), ((), ()))  # xᵀ y  (contract first dims)


def _mm(a, b, dims, dtype=None):
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    )


def _softmax_from_lse(sim, sim_n, lse_col, have_null):
    """Softmax rows from the SAVED forward log-sum-exp (the standard flash
    backward trick): attn = exp(sim − lse).  Skips the max/sum reductions
    and the divide of a full recompute — ~4 VPU passes per head per chunk
    in kernels that are VPU-bound."""
    attn = jnp.exp(sim - lse_col)
    attn_n = jnp.exp(sim_n - lse_col) if have_null else None
    return attn, attn_n


def _rows32(a, b_row):
    """rowsum(a ⊙ b_row) in fp32; a (chunk, d), b_row (1, d) → (chunk, 1)."""
    return jnp.sum(
        a.astype(jnp.float32) * b_row.astype(jnp.float32),
        axis=-1, keepdims=True,
    )


def _grid_specs(chunk, nk, hg, d):
    """Block specs over the (batch, head-group, q-chunk) grid: q-shaped
    operands stream one chunk per grid step; key-shaped operands are whole
    per (batch, group) and constant over qi (no re-fetch)."""
    w = hg * d
    qchunk = pl.BlockSpec((1, chunk, w), lambda i, j, qi: (i, qi, j),
                          memory_space=pltpu.VMEM)
    kfull = pl.BlockSpec((1, nk, w), lambda i, j, qi: (i, 0, j),
                         memory_space=pltpu.VMEM)
    biasrow = pl.BlockSpec((1, 1, hg, nk), lambda i, j, qi: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    nullrow = pl.BlockSpec((1, hg, d), lambda i, j, qi: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    nullone = pl.BlockSpec((1, hg, 1), lambda i, j, qi: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    nullout = pl.BlockSpec((1, 1, hg, d), lambda i, j, qi: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    lsechunk = pl.BlockSpec((1, 1, hg, chunk), lambda i, j, qi: (i, j, 0, qi),
                            memory_space=pltpu.VMEM)
    return qchunk, kfull, biasrow, nullrow, nullone, nullout, lsechunk


def _bwd_sc_kernel(q_ref, k_ref, v_ref, bias_ref, nullk_ref, nullv_ref,
                   nullb_ref, g_ref, lse_ref,
                   dq_ref, dk_ref, dv_ref, dnk_ref, dnv_ref,
                   stq_ref, sv_ref, scol_ref, snq_ref, snv_ref, snc_ref,
                   *, hg, d, nchunks, l2_dist, coeff, have_null):
    """Single-pass backward: identical math to the fused kernel's bwd; the
    row softmax comes from the SAVED forward lse (attn = exp(sim − lse))
    and delta = rowsum(attn⊙dattn) — so (dq, dk, dv, dnull) is a pure
    function of (q, k, v, null, g, lse) and the op is cleanly
    differentiable as `flash_bwd_so` (lse is an exact forward intermediate;
    its cotangent is structurally zero — see `_so_op_bwd`)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        stq_ref[...] = jnp.zeros_like(stq_ref)
        sv_ref[...] = jnp.zeros_like(sv_ref)
        scol_ref[...] = jnp.zeros_like(scol_ref)
        snq_ref[...] = jnp.zeros_like(snq_ref)
        snv_ref[...] = jnp.zeros_like(snv_ref)
        snc_ref[...] = jnp.zeros_like(snc_ref)

    q_c = q_ref[0]        # (chunk, hg·d)
    k_all = k_ref[0]      # k_pre = coeff·k
    v_all = v_ref[0]
    g_c = g_ref[0]
    bias = bias_ref[0, 0]

    dqs = []
    for h in range(hg):
        lo = h * d
        qc = q_c[:, lo : lo + d]
        kh = k_all[:, lo : lo + d]
        vh = v_all[:, lo : lo + d]
        gh = g_c[:, lo : lo + d]
        lse_col = lse_ref[0, 0, h, :][:, None]
        sim = _mm(qc, kh, _NT) + bias[h : h + 1, :]
        if have_null:
            nullk32 = nullk_ref[0, h : h + 1, :].astype(jnp.float32)
            sim_n = _rows32(qc, nullk32) + nullb_ref[0, h : h + 1, :]
        else:
            nullk32 = sim_n = None
        attn, attn_n = _softmax_from_lse(sim, sim_n, lse_col, have_null)
        dattn = _mm(gh, vh, _NT)
        delta = jnp.sum(attn * dattn, axis=-1, keepdims=True)
        if have_null:
            nullv32 = nullv_ref[0, h : h + 1, :].astype(jnp.float32)
            dattn_n = _rows32(gh, nullv32)
            delta = delta + attn_n * dattn_n
        dsim = attn * (dattn - delta)
        dsim_m = dsim.astype(kh.dtype)
        dq = _mm(dsim_m, kh, _NN)
        if have_null:
            dsim_n = attn_n * (dattn_n - delta)
            dq = dq + dsim_n * nullk32
            snv_ref[h] = snv_ref[h] + jnp.sum(
                attn_n * gh.astype(jnp.float32), axis=0, keepdims=True
            )
            snq_ref[h] = snq_ref[h] + jnp.sum(
                dsim_n * qc.astype(jnp.float32), axis=0, keepdims=True
            )
            snc_ref[h] = snc_ref[h] + jnp.sum(dsim_n)
        dqs.append(dq.astype(dq_ref.dtype))
        sv_ref[h] = sv_ref[h] + _mm(attn.astype(gh.dtype), gh, _TN)
        stq_ref[h] = stq_ref[h] + _mm(dsim_m, qc, _TN)
        if l2_dist:
            scol_ref[h] = scol_ref[h] + jnp.sum(dsim, axis=0)[:, None]
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)

    @pl.when(qi == nchunks - 1)
    def _flush():
        dks = []
        for h in range(hg):
            lo = h * d
            if l2_dist:
                dk_h = coeff * stq_ref[h] - scol_ref[h] * k_all[
                    :, lo : lo + d
                ].astype(jnp.float32)
            else:
                dk_h = coeff * stq_ref[h]
            dks.append(dk_h.astype(dk_ref.dtype))
        dk_ref[0] = jnp.concatenate(dks, axis=-1)
        dv_ref[0] = jnp.concatenate(
            [sv_ref[h].astype(dv_ref.dtype) for h in range(hg)], axis=-1
        )
        # (hg, d) row-stack assembly via one-hot broadcasts (Mosaic cannot
        # concat (1, d) reduction results along sublanes)
        dnk_mat = jnp.zeros((hg, d), jnp.float32)
        dnv_mat = jnp.zeros((hg, d), jnp.float32)
        if have_null:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (hg, 1), 0)
            for h in range(hg):
                if l2_dist:
                    nullk32 = nullk_ref[0, h : h + 1, :].astype(
                        jnp.float32
                    )
                    row = coeff * snq_ref[h] - snc_ref[h] * nullk32
                else:
                    row = coeff * snq_ref[h]
                sel = row_ids == h
                dnk_mat = dnk_mat + jnp.where(sel, row, 0.0)
                dnv_mat = dnv_mat + jnp.where(sel, snv_ref[h], 0.0)
        dnk_ref[0, 0] = dnk_mat.astype(dnk_ref.dtype)
        dnv_ref[0, 0] = dnv_mat.astype(dnv_ref.dtype)


def _bwd2_kernel(q_ref, k_ref, v_ref, bias_ref, nullk_ref, nullv_ref,
                 nullb_ref, g_ref, ca_ref, cbp_ref, cc_ref, negw_ref,
                 cbnp_ref, ccn_ref, negwn_ref, lse_ref,
                 cq_ref, ck_ref, cv_ref, cg_ref, cnk_ref, cnv_ref,
                 sck_ref, scv_ref, su_ref, scs_ref,
                 scnk_ref, scnv_ref, sun_ref, scsn_ref,
                 *, hg, d, nchunks, l2_dist, coeff, have_null):
    """Adjoint of `_bwd_sc_kernel` (the module-docstring math).

    Operand folding (all prepared XLA-side, fused with the outer graph):
      k_ref    = k̂ = coeff·k            nullk_ref = coeff·n_k
      cbp_ref  = coeff·B̃ (cot dk)       cbnp_ref  = coeff·cot(dn_k), fp32
      negw_ref = −coeff·⟨B̃ⱼ, kⱼ⟩ rows   negwn_ref = −coeff·⟨cot dn_k, n_k⟩
      (negw/negwn are zero for dot-product similarity)
    ca_ref (cot dq) and cc_ref (cot dv) enter RAW — every use already
    carries coeff through k̂/cbp or picks it up in the epilogue.
    ck1/ck2 of the docstring math are merged into one scratch (both take
    coeff· in the epilogue)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        sck_ref[...] = jnp.zeros_like(sck_ref)
        scv_ref[...] = jnp.zeros_like(scv_ref)
        su_ref[...] = jnp.zeros_like(su_ref)
        scs_ref[...] = jnp.zeros_like(scs_ref)
        scnk_ref[...] = jnp.zeros_like(scnk_ref)
        scnv_ref[...] = jnp.zeros_like(scnv_ref)
        sun_ref[...] = jnp.zeros_like(sun_ref)
        scsn_ref[...] = jnp.zeros_like(scsn_ref)

    q_c = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    g_c = g_ref[0]
    ca_c = ca_ref[0]
    cbp_all = cbp_ref[0]
    cc_all = cc_ref[0]
    bias = bias_ref[0, 0]
    negw = negw_ref[0, 0]
    mmdt = k_all.dtype

    cqs = []
    cgs = []
    for h in range(hg):
        lo = h * d
        qc = q_c[:, lo : lo + d]
        kh = k_all[:, lo : lo + d]
        vh = v_all[:, lo : lo + d]
        gh = g_c[:, lo : lo + d]
        cah = ca_c[:, lo : lo + d]
        cbh = cbp_all[:, lo : lo + d]
        cch = cc_all[:, lo : lo + d]
        lse_col = lse_ref[0, 0, h, :][:, None]

        # ---- recompute forward + first-order pieces ----
        sim = _mm(qc, kh, _NT) + bias[h : h + 1, :]
        if have_null:
            nullk32 = nullk_ref[0, h : h + 1, :].astype(jnp.float32)
            nullv32 = nullv_ref[0, h : h + 1, :].astype(jnp.float32)
            cbnp32 = cbnp_ref[0, h : h + 1, :]
            ccn32 = ccn_ref[0, h : h + 1, :]
            sim_n = _rows32(qc, nullk32) + nullb_ref[0, h : h + 1, :]
        else:
            nullk32 = nullv32 = cbnp32 = ccn32 = sim_n = None
        attn, attn_n = _softmax_from_lse(sim, sim_n, lse_col, have_null)
        dattn = _mm(gh, vh, _NT)
        delta = jnp.sum(attn * dattn, axis=-1, keepdims=True)
        if have_null:
            dattn_n = _rows32(gh, nullv32)
            delta = delta + attn_n * dattn_n
        t_mat = dattn - delta
        dsim = attn * t_mat
        if have_null:
            t_n = dattn_n - delta
            dsim_n = attn_n * t_n

        # ---- adjoint ----
        c_ds = _mm(cah, kh, _NT) + _mm(qc, cbh, _NT)
        if l2_dist:
            c_ds = c_ds + negw[h : h + 1, :]
        c_t = c_ds * attn
        c_row = -jnp.sum(c_t, axis=-1, keepdims=True)
        if have_null:
            c_dsn = _rows32(cah, nullk32) + _rows32(qc, cbnp32)
            if l2_dist:
                c_dsn = c_dsn + negwn_ref[0, h : h + 1, :]
            c_tn = c_dsn * attn_n
            c_row = c_row - c_tn
        c_dat = c_t + c_row * attn
        c_p = c_ds * t_mat + _mm(gh, cch, _NT) + c_row * dattn
        if have_null:
            c_datn = c_tn + c_row * attn_n
            c_pn = c_dsn * t_n + _rows32(gh, ccn32) + c_row * dattn_n
        rho = jnp.sum(attn * c_p, axis=-1, keepdims=True)
        if have_null:
            rho = rho + attn_n * c_pn
        c_s = attn * (c_p - rho)
        if have_null:
            c_sn = attn_n * (c_pn - rho)

        # one cast pass per (chunk, nk) temporary — each feeds 2 matmuls
        dsim_m = dsim.astype(mmdt)
        c_s_m = c_s.astype(mmdt)
        c_dat_m = c_dat.astype(mmdt)
        cq_c = _mm(dsim_m, cbh, _NN) + _mm(c_s_m, kh, _NN)
        cg_c = _mm(c_dat_m, vh, _NN) + _mm(attn.astype(mmdt), cch, _NN)
        if have_null:
            cq_c = cq_c + dsim_n * cbnp32 + c_sn * nullk32
            cg_c = cg_c + c_datn * nullv32 + attn_n * ccn32
        cqs.append(cq_c.astype(cq_ref.dtype))
        cgs.append(cg_c.astype(cg_ref.dtype))

        sck_ref[h] = sck_ref[h] + _mm(dsim_m, cah, _TN) \
            + _mm(c_s_m, qc, _TN)
        scv_ref[h] = scv_ref[h] + _mm(c_dat_m, gh, _TN)
        if l2_dist:
            su_ref[h] = su_ref[h] + jnp.sum(dsim, axis=0)[:, None]
            scs_ref[h] = scs_ref[h] + jnp.sum(c_s, axis=0)[:, None]
        if have_null:
            scnk_ref[h] = scnk_ref[h] + jnp.sum(
                dsim_n * cah.astype(jnp.float32), axis=0, keepdims=True
            ) + jnp.sum(
                c_sn * qc.astype(jnp.float32), axis=0, keepdims=True
            )
            scnv_ref[h] = scnv_ref[h] + jnp.sum(
                c_datn * gh.astype(jnp.float32), axis=0, keepdims=True
            )
            if l2_dist:
                sun_ref[h] = sun_ref[h] + jnp.sum(dsim_n)
                scsn_ref[h] = scsn_ref[h] + jnp.sum(c_sn)
    cq_ref[0] = jnp.concatenate(cqs, axis=-1)
    cg_ref[0] = jnp.concatenate(cgs, axis=-1)

    @pl.when(qi == nchunks - 1)
    def _flush():
        cks = []
        cvs = []
        for h in range(hg):
            lo = h * d
            ck_h = coeff * sck_ref[h]
            if l2_dist:
                ck_h = ck_h - su_ref[h] * cbp_all[:, lo : lo + d].astype(
                    jnp.float32
                )
                ck_h = ck_h - scs_ref[h] * k_all[:, lo : lo + d].astype(
                    jnp.float32
                )
            cks.append(ck_h.astype(ck_ref.dtype))
            cvs.append(scv_ref[h].astype(cv_ref.dtype))
        ck_ref[0] = jnp.concatenate(cks, axis=-1)
        cv_ref[0] = jnp.concatenate(cvs, axis=-1)

        cnk_mat = jnp.zeros((hg, d), jnp.float32)
        cnv_mat = jnp.zeros((hg, d), jnp.float32)
        if have_null:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (hg, 1), 0)
            for h in range(hg):
                nullk32 = nullk_ref[0, h : h + 1, :].astype(jnp.float32)
                cbnp32 = cbnp_ref[0, h : h + 1, :]
                row = coeff * scnk_ref[h]
                if l2_dist:
                    row = row - sun_ref[h] * cbnp32 \
                        - scsn_ref[h] * nullk32
                sel = row_ids == h
                cnk_mat = cnk_mat + jnp.where(sel, row, 0.0)
                cnv_mat = cnv_mat + jnp.where(sel, scnv_ref[h], 0.0)
        cnk_ref[0, 0] = cnk_mat.astype(cnk_ref.dtype)
        cnv_ref[0, 0] = cnv_mat.astype(cnv_ref.dtype)


# ---------------------------------------------------------------------------
# flash_bwd_so: the differentiable attention backward
# ---------------------------------------------------------------------------


def _resolve(q, heads, scale, interpret):
    interpret = (not pallas_supported()) if interpret is None else interpret
    d_head = q.shape[-1] // heads
    if scale is None:
        scale = d_head ** -0.5
    hg = head_group(heads, d_head) or (heads if interpret else None)
    assert hg is not None, "caller must gate on head_group()"
    return d_head, scale, hg, interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def flash_bwd_so(q, k, v, null_kv, g, lse, heads, l2_dist=False, scale=None,
                 interpret=None):
    """Differentiable fused-heads attention backward:
    (q, k, v, null_kv, g, lse) → (dq, dk, dv, dnull).  `lse` is the
    forward kernel's saved (b, hb, hg, nq_pad) log-sum-exp (get it from
    `_so_fwd_op`); its cotangent is structurally zero (see `_so_op_bwd`)."""
    return _bwd_sc_impl(q, k, v, null_kv, g, lse, heads, l2_dist, scale,
                        interpret)


def _bwd_sc_impl(q, k, v, null_kv, g, lse, heads, l2_dist, scale, interpret):
    d_head, scale, hg, interpret = _resolve(q, heads, scale, interpret)
    b, nq, hd = q.shape
    nk = k.shape[1]
    (qp, k_pre, vp, bias, nullk_pre, nullv, null_bias,
     (_, _, _, d, hb), coeff) = _prep_fused(
        q, k, v, null_kv, heads, hg, l2_dist, scale
    )
    nq_pad, nk_pad = qp.shape[1], k_pre.shape[1]
    assert lse.shape == (b, hb, hg, nq_pad), (lse.shape, (b, hb, hg, nq_pad))
    gp = g
    if nq_pad != nq:
        gp = jnp.pad(g, ((0, 0), (0, nq_pad - nq), (0, 0)))
    gp = gp.astype(qp.dtype)
    chunk = _q_chunks(nq_pad, nk_pad, budget_bytes=_BWD_BUDGET // hg)
    nchunks = nq_pad // chunk

    qchunk, kfull, biasrow, nullrow, nullone, nullout, lsechunk = (
        _grid_specs(chunk, nk_pad, hg, d)
    )
    dq, dk, dv, dnk, dnv = pl.pallas_call(
        functools.partial(
            _bwd_sc_kernel, hg=hg, d=d, nchunks=nchunks, l2_dist=l2_dist,
            coeff=coeff, have_null=null_kv is not None,
        ),
        grid=(b, hb, nchunks),
        in_specs=[qchunk, kfull, kfull, biasrow, nullrow, nullrow,
                  nullone, qchunk, lsechunk],
        out_specs=(qchunk, kfull, kfull, nullout, nullout),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, hb, hg, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hb, hg, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hg, nk_pad, d), jnp.float32),
            pltpu.VMEM((hg, nk_pad, d), jnp.float32),
            pltpu.VMEM((hg, nk_pad, 1), jnp.float32),
            pltpu.VMEM((hg, 1, d), jnp.float32),
            pltpu.VMEM((hg, 1, d), jnp.float32),
            pltpu.VMEM((hg, 1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(qp, k_pre, vp, bias, nullk_pre, nullv, null_bias, gp, lse)

    dq = dq[:, :nq].astype(q.dtype)
    dk = dk[:, :nk].astype(k.dtype)
    dv = dv[:, :nk].astype(v.dtype)
    if null_kv is None:
        dnull = None
    else:
        dnull = jnp.stack(
            (
                jnp.sum(dnk, axis=0).reshape(heads, d),
                jnp.sum(dnv, axis=0).reshape(heads, d),
            ),
            axis=0,
        ).astype(null_kv.dtype)
    return dq, dk, dv, dnull


def _bwd_so_fwd(q, k, v, null_kv, g, lse, heads, l2_dist, scale, interpret):
    # NB: calls the WRAPPED op, not _bwd_sc_impl — the op must stay opaque
    # (custom-vjp) in the fwd rule's trace so outer differentiation levels
    # keep hitting this rule instead of linearizing the raw pallas_call
    # (same recursion trick as pconv2d/pcorr2d in ops/pallas/adaptive_conv)
    out = flash_bwd_so(q, k, v, null_kv, g, lse, heads, l2_dist, scale,
                       interpret)
    return out, (q, k, v, null_kv, g, lse)


def _bwd_so_bwd(heads, l2_dist, scale, interpret, residuals, cots):
    q, k, v, null_kv, g, lse = residuals
    cdq, cdk, cdv, cdnull = cots
    d_head, scale, hg, interpret = _resolve(q, heads, scale, interpret)
    b, nq, hd = q.shape
    nk = k.shape[1]
    assert nq % 8 == 0, (
        "second-order flash attention needs nq % 8 == 0 (gate via "
        "flash_so_auto)"
    )
    (qp, k_pre, vp, bias, nullk_pre, nullv, null_bias,
     (_, _, _, d, hb), coeff) = _prep_fused(
        q, k, v, null_kv, heads, hg, l2_dist, scale
    )
    nq_pad, nk_pad = qp.shape[1], k_pre.shape[1]

    def padq(t):
        if t.shape[1] != nq_pad:
            t = jnp.pad(t, ((0, 0), (0, nq_pad - t.shape[1]), (0, 0)))
        return t.astype(qp.dtype)

    def padk(t):
        if t.shape[1] != nk_pad:
            t = jnp.pad(t, ((0, 0), (0, nk_pad - t.shape[1]), (0, 0)))
        return t.astype(qp.dtype)

    gp = padq(g)
    cap = padq(cdq)
    cbp = padk(coeff * cdk.astype(jnp.float32))
    ccp = padk(cdv)
    if l2_dist:
        # negw rows: −coeff·⟨B̃ⱼ, kⱼ⟩ per (b, head, key), fp32 accumulation
        kh = k.reshape(b, nk, heads, d_head)
        cbkh = cdk.reshape(b, nk, heads, d_head)
        negw = -coeff * jnp.einsum(
            "bkhd,bkhd->bhk", cbkh, kh, preferred_element_type=jnp.float32
        )
        if nk_pad != nk:
            negw = jnp.pad(negw, ((0, 0), (0, 0), (0, nk_pad - nk)))
    else:
        negw = jnp.zeros((b, heads, nk_pad), jnp.float32)
    negw = negw.reshape(b, hb, hg, nk_pad)

    if null_kv is not None:
        cbn = cdnull[0].astype(jnp.float32)       # (H, d)
        ccn = cdnull[1].astype(jnp.float32)
        cbnp = coeff * cbn
        if l2_dist:
            negwn = -coeff * jnp.sum(
                cbn * null_kv[0].astype(jnp.float32), axis=-1, keepdims=True
            )
        else:
            negwn = jnp.zeros((heads, 1), jnp.float32)
    else:
        cbnp = jnp.zeros((heads, d_head), jnp.float32)
        ccn = jnp.zeros((heads, d_head), jnp.float32)
        negwn = jnp.zeros((heads, 1), jnp.float32)
    cbnp = cbnp.reshape(hb, hg, d_head)
    ccn = ccn.reshape(hb, hg, d_head)
    negwn = negwn.reshape(hb, hg, 1)

    # the adjoint holds ~14 (chunk, nk) fp32 temporaries per unrolled
    # head; with one chunk per grid step, _BWD2_BUDGET/hg keeps the D's
    # batch-expanded 1024-token attention under the 16M scoped-VMEM limit
    # (see the budget sweep note at the constants)
    assert lse.shape == (b, hb, hg, nq_pad), (lse.shape, (b, hb, hg, nq_pad))
    chunk = _q_chunks(nq_pad, nk_pad, budget_bytes=_BWD2_BUDGET // hg)
    nchunks = nq_pad // chunk
    qchunk, kfull, biasrow, nullrow, nullone, nullout, lsechunk = (
        _grid_specs(chunk, nk_pad, hg, d)
    )
    cq, ck, cv, cg, cnk, cnv = pl.pallas_call(
        functools.partial(
            _bwd2_kernel, hg=hg, d=d, nchunks=nchunks, l2_dist=l2_dist,
            coeff=coeff, have_null=null_kv is not None,
        ),
        grid=(b, hb, nchunks),
        in_specs=[qchunk, kfull, kfull, biasrow, nullrow, nullrow,
                  nullone, qchunk, qchunk, kfull, kfull, biasrow,
                  nullrow, nullrow, nullone, lsechunk],
        out_specs=(qchunk, kfull, kfull, qchunk, nullout, nullout),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, nk_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, nq_pad, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, hb, hg, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hb, hg, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hg, nk_pad, d), jnp.float32),
            pltpu.VMEM((hg, nk_pad, d), jnp.float32),
            pltpu.VMEM((hg, nk_pad, 1), jnp.float32),
            pltpu.VMEM((hg, nk_pad, 1), jnp.float32),
            pltpu.VMEM((hg, 1, d), jnp.float32),
            pltpu.VMEM((hg, 1, d), jnp.float32),
            pltpu.VMEM((hg, 1, 1), jnp.float32),
            pltpu.VMEM((hg, 1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(qp, k_pre, vp, bias, nullk_pre, nullv, null_bias,
      gp, cap, cbp, ccp, negw, cbnp, ccn, negwn, lse)

    cq = cq[:, :nq].astype(q.dtype)
    ck = ck[:, :nk].astype(k.dtype)
    cv = cv[:, :nk].astype(v.dtype)
    cg = cg[:, :nq].astype(g.dtype)
    if null_kv is None:
        cnull = None
    else:
        cnull = jnp.stack(
            (
                jnp.sum(cnk, axis=0).reshape(heads, d),
                jnp.sum(cnv, axis=0).reshape(heads, d),
            ),
            axis=0,
        ).astype(null_kv.dtype)
    # zero cotangent for lse: the adjoint formulas above are the FULL
    # softmax derivative wrt (q, k), so the saved-lse input carries no
    # independent sensitivity (standard flash-backward residual)
    return cq, ck, cv, cnull, cg, jnp.zeros_like(lse)


flash_bwd_so.defvjp(_bwd_so_fwd, _bwd_so_bwd)


# ---------------------------------------------------------------------------
# flash_attend_so: the public second-order attention
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _so_fwd_op(q, k, v, null_kv, heads, l2_dist=False, scale=None,
               interpret=None):
    """Fused-heads attention forward returning (out, lse); closed under
    second-order reverse AD.  lse (b, hb, hg, nq_pad fp32) is the saved
    softmax log-sum-exp consumed by `flash_bwd_so` — its backward treats
    lse's cotangent as structurally zero (see `_so_op_bwd`), so lse MUST
    NOT feed any other differentiated computation."""
    out, (_, lse) = _fwd_impl(q, k, v, null_kv, heads, l2_dist, scale,
                              interpret)
    return out, lse


def _so_op_fwd(q, k, v, null_kv, heads, l2_dist, scale, interpret):
    # recursive call keeps the op opaque under nested differentiation
    # (see _bwd_so_fwd); residuals are the primal inputs + the saved lse
    out, lse = _so_fwd_op(q, k, v, null_kv, heads, l2_dist, scale,
                          interpret)
    return (out, lse), (q, k, v, null_kv, lse)


def _so_op_bwd(heads, l2_dist, scale, interpret, residuals, cots):
    q, k, v, null_kv, lse = residuals
    g, _g_lse = cots
    # _g_lse is structurally zero: lse's only legal consumer is
    # flash_bwd_so, whose vjp returns a zero lse-cotangent (the hand-
    # written adjoint already encodes the full softmax derivative)
    return flash_bwd_so(q, k, v, null_kv, g, lse, heads, l2_dist, scale,
                        interpret)


_so_fwd_op.defvjp(_so_op_fwd, _so_op_bwd)


def flash_attend_so(q, k, v, null_kv, heads, l2_dist=False, scale=None,
                    interpret=None):
    """Fused-heads attention, closed under second-order reverse AD:
    q (b, nq, H·d), k/v (b, nk, H·d), null_kv (2, H, d) or None."""
    out, _ = _so_fwd_op(q, k, v, null_kv, heads, l2_dist, scale, interpret)
    return out
