"""Pallas TPU kernel: fused sample-adaptive modulated 3x3 conv.

The XLA decomposition in `ops.adaptive_conv` runs ONE conv with n·o output
channels and mixes outputs per sample — n× the conv FLOPs (n = number of
kernel banks).  This kernel removes that factor: for each (sample, output
tile) it mixes the kernel banks ONCE in VMEM with the sample's softmax
selection weights, then computes the conv as 9 shifted MXU matmuls with the
mixed weights, applying the demodulation output scale in-register.  The
per-sample weights never exist in HBM — the exact fusion SURVEY.md §2.1
names as the top perf lever (the reference materializes b·o·i·k·k weights
for a cuDNN grouped conv, gigagan_pytorch.py:381,402-407).

Layout contract (same as ops.adaptive_conv):
  x_mod   (b, h, w, i)   activations with (1+mod) folded in
  weights (n, 3, 3, i, o)
  attn    (b, n)         softmax kernel-selection
  demod   (b, o)         output scale (ones when demod=False)
  out     (b, h, w, o)

Both input and output channels are tiled so weight blocks fit VMEM at
dim_max-scale layers (o tiles of 128 lanes; i tiles chosen to budget).

Autodiff: the public ops (`pconv2d`, `pcorr2d`) are mutually-recursive
custom VJPs CLOSED under reverse-mode differentiation — each one's backward
is a composition of the two ops — so the trainer's R1 gradient-penalty
double-backward runs on the fused kernels to arbitrary order:
  dx      — the SAME kernel on the cotangent with spatially flipped,
            (i,o)-transposed weights
  dW, da  — one kernel forming the per-sample weight-gradient tile in VMEM
            and contracting it immediately against (a) the selection weights
            into dW and (b) the kernel banks into da — nothing per-sample
            ever reaches HBM.

Grid discipline: TPU grids run sequentially on the core, so accumulator
output blocks are valid while their revisits are consecutive — the batch
(and input-tile) loops sit innermost; da lives in SMEM as a full block that
stays resident for the whole kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform == "tpu"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _row_chunks(h, w_dim, co_tile, budget_bytes=4 * 1024 * 1024):
    """Accumulator row-chunking so (chunk·w, co_tile) fp32 fits the budget.
    VMEM values are lane-padded to 128, so thin co_tile still pays full
    lanes."""
    co_vmem = _round_up(co_tile, 128)
    rows = max(1, budget_bytes // (w_dim * co_vmem * 4))
    rows = min(rows, h)
    while h % rows != 0:
        rows -= 1
    return rows


def _ci_tile(ci, n, co_tile, budget_bytes=4 * 1024 * 1024):
    """Input-channel tile so the (n, 3, 3, ci_t, co_t) fp32 weight block
    fits the budget."""
    t = max(1, budget_bytes // (n * 9 * co_tile * 4))
    t = min(t, ci)
    while ci % t != 0:
        t -= 1
    return t


# ----------------------------------------------------------------- forward

def _fwd_kernel(x_ref, w_ref, attn_ref, demod_ref, out_ref, acc_ref, *, n,
                h, w_dim, ci_t, co_tile, chunk, n_i):
    # grid = (batch, o_tiles, i_tiles) — i innermost so the accumulator
    # stays resident while input-channel partial sums accumulate
    bi = pl.program_id(0)
    ii = pl.program_id(2)

    x = x_ref[0]  # (h+2, w+2, ci_t)

    w_mix = attn_ref[bi, 0].astype(jnp.float32) * w_ref[0].astype(jnp.float32)
    for bank in range(1, n):
        w_mix = w_mix + (
            attn_ref[bi, bank].astype(jnp.float32)
            * w_ref[bank].astype(jnp.float32)
        )
    # keep MXU operands in the input dtype (bf16 x bf16 -> fp32 accumulate);
    # an fp32 upcast would force the slow fp32 MXU path
    w_mix = w_mix.astype(x.dtype)

    scale = demod_ref[bi].astype(jnp.float32)

    if n_i == 1:
        # single input tile: no scratch, write scaled chunks directly
        for r0 in range(0, h, chunk):
            acc = jnp.zeros((chunk * w_dim, co_tile), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    patch = x[r0 + ky : r0 + ky + chunk, kx : kx + w_dim, :]
                    acc = acc + jnp.dot(
                        patch.reshape(chunk * w_dim, ci_t),
                        w_mix[ky, kx],
                        preferred_element_type=jnp.float32,
                    )
            out = (acc * scale[None, :]).reshape(chunk, w_dim, co_tile)
            out_ref[0, r0 : r0 + chunk] = out.astype(out_ref.dtype)
        return

    @pl.when(ii == 0)
    def _zero_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for r0 in range(0, h, chunk):
        acc = jnp.zeros((chunk * w_dim, co_tile), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                patch = x[r0 + ky : r0 + ky + chunk, kx : kx + w_dim, :]
                acc = acc + jnp.dot(
                    patch.reshape(chunk * w_dim, ci_t),
                    w_mix[ky, kx],
                    preferred_element_type=jnp.float32,
                )
        acc_ref[r0 : r0 + chunk] += acc.reshape(chunk, w_dim, co_tile)

    @pl.when(ii == n_i - 1)
    def _finish():
        out_ref[0] = (acc_ref[...] * scale[None, None, :]).astype(
            out_ref.dtype
        )


def _block_rows(h, w_dim, ci_t, co_tile, n, n_i,
                budget_bytes=4 * 1024 * 1024):
    """Largest divisor of h whose per-grid-step VMEM footprint (x window +
    output block, double-buffered, + the weight block and the fp32
    accumulator scratch) fits the budget.  h when everything fits — the
    fast small-spatial path is unchanged."""
    # VMEM lane-pads the last dim to 128: thin ci/co tiles still pay full
    # lanes on-chip (HBM arrays stay dense)
    ci_vmem = _round_up(ci_t, 128)
    co_vmem = _round_up(co_tile, 128)
    w_blk = n * 9 * ci_vmem * co_vmem * 2
    rc = h
    while rc > 8:
        x_blk = (rc + 2) * (w_dim + 2) * ci_vmem * 2
        o_blk = rc * w_dim * co_vmem * 2
        scratch = rc * w_dim * co_vmem * 4 if n_i > 1 else 0
        if 2 * (x_blk + o_blk) + w_blk + scratch <= budget_bytes:
            break
        rc //= 2
    while h % rc != 0:
        rc -= 1
    return rc


def _expand_row_windows(x_pad, rc):
    """(b, h+2, w+2, ci) → (b·n_chunks, rc+2, w+2, ci): overlapping row
    windows with their 1-row halos, so a row-chunked grid needs no
    cross-block halo exchange.  Costs one extra pass over x in HBM."""
    h = x_pad.shape[1] - 2
    n_ch = h // rc
    from jax import lax

    windows = [
        lax.slice_in_dim(x_pad, i * rc, i * rc + rc + 2, axis=1)
        for i in range(n_ch)
    ]
    xw = jnp.stack(windows, axis=1)
    return xw.reshape(
        x_pad.shape[0] * n_ch, rc + 2, x_pad.shape[2], x_pad.shape[3]
    ), n_ch


def _fwd_pallas(x_mod, weights, attn, demod, *, co_tile, interpret):
    b, h, w_dim, ci = x_mod.shape
    n = weights.shape[0]
    co = weights.shape[-1]
    co_tile = min(co_tile, _round_up(co, 128))
    co_pad = _round_up(co, co_tile)
    if co_pad != co:
        weights = jnp.pad(
            weights, ((0, 0), (0, 0), (0, 0), (0, 0), (0, co_pad - co))
        )
        demod = jnp.pad(demod, ((0, 0), (0, co_pad - co)))

    x_pad = jnp.pad(x_mod, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ci_t0 = _ci_tile(ci, n, co_tile)
    rc = _block_rows(h, w_dim, ci_t0, co_tile, n, ci // ci_t0)
    if rc < h:
        # row-chunked grid for large spatial maps: the kernel is unchanged
        # — each window is an independent "sample" with its halo baked in
        x_pad, n_ch = _expand_row_windows(x_pad, rc)
        attn = jnp.repeat(attn, n_ch, axis=0)
        demod = jnp.repeat(demod, n_ch, axis=0)
        out = _fwd_call(x_pad, weights, attn, demod, rc, w_dim,
                        co_tile=co_tile, interpret=interpret)
        return out.reshape(b, h, w_dim, co_pad)[..., :co]
    return _fwd_call(x_pad, weights, attn, demod, h, w_dim,
                     co_tile=co_tile, interpret=interpret)[..., :co]


def _fwd_call(x_pad, weights, attn, demod, h, w_dim, *, co_tile, interpret):
    b, ci = x_pad.shape[0], x_pad.shape[3]
    n = weights.shape[0]
    co_pad = weights.shape[-1]
    chunk = _row_chunks(h, w_dim, co_tile)
    ci_t = _ci_tile(ci, n, co_tile)
    n_i = ci // ci_t

    grid = (b, co_pad // co_tile, n_i)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n=n, h=h, w_dim=w_dim, ci_t=ci_t, co_tile=co_tile,
            chunk=chunk, n_i=n_i,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2, w_dim + 2, ci_t),
                         lambda bi, oi, ii: (bi, 0, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 3, 3, ci_t, co_tile),
                         lambda bi, oi, ii: (0, 0, 0, ii, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, n), lambda bi, oi, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, co_tile), lambda bi, oi, ii: (0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w_dim, co_tile), lambda bi, oi, ii: (bi, 0, 0, oi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w_dim, co_pad), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (h, w_dim, co_tile) if n_i > 1 else (1, 1, 1), jnp.float32
            )
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_dim * 9 * ci * co_pad,
            bytes_accessed=(
                x_pad.size * x_pad.dtype.itemsize
                + weights.size * weights.dtype.itemsize
                + b * h * w_dim * co_pad * x_pad.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(x_pad, weights, attn, demod)
    return out


# ---------------------------------------------------------------- backward

def _bwd_w_kernel(x_ref, g_ref, w_ref, attn_ref, dw_ref, da_ref, *, n, b,
                  h, w_dim, ci_t, co_tile, chunk):
    # grid = (o_tiles, i_tiles, batch) — batch innermost: the dw block stays
    # resident across its accumulation sweep
    oi = pl.program_id(0)
    ii = pl.program_id(1)
    bi = pl.program_id(2)

    @pl.when(bi == 0)
    def _zero_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    @pl.when((oi == 0) & (ii == 0) & (bi == 0))
    def _zero_da():
        # SMEM accepts only scalar stores
        for bb in range(b):
            for bank in range(n):
                da_ref[bb, bank] = 0.0

    x = x_ref[0]  # (h+2, w+2, ci_t)

    for ky in range(3):
        for kx in range(3):
            dw_local = jnp.zeros((ci_t, co_tile), jnp.float32)
            for r0 in range(0, h, chunk):
                patch = x[r0 + ky : r0 + ky + chunk, kx : kx + w_dim, :]
                g = g_ref[0, r0 : r0 + chunk]
                dw_local = dw_local + jnp.dot(
                    patch.reshape(chunk * w_dim, ci_t).T,
                    g.reshape(chunk * w_dim, co_tile),
                    preferred_element_type=jnp.float32,
                )
            for bank in range(n):
                a = attn_ref[bi, bank].astype(jnp.float32)
                dw_ref[bank, ky, kx] += a * dw_local
                da_ref[bi, bank] += jnp.sum(
                    w_ref[bank, ky, kx].astype(jnp.float32) * dw_local
                )


def _bwd_w_pallas(x_pad, g_scaled, weights, attn, *, co_tile, interpret):
    b, hp, wp, ci = x_pad.shape
    h, w_dim = hp - 2, wp - 2
    n, _, _, _, co = weights.shape
    co_tile = min(co_tile, _round_up(co, 128))
    co_pad = _round_up(co, co_tile)
    if co_pad != co:
        weights = jnp.pad(
            weights, ((0, 0), (0, 0), (0, 0), (0, 0), (0, co_pad - co))
        )
        g_scaled = jnp.pad(
            g_scaled, ((0, 0), (0, 0), (0, 0), (0, co_pad - co))
        )
    chunk = _row_chunks(h, w_dim, co_tile)
    ci_t = _ci_tile(ci, n, co_tile, budget_bytes=3 * 1024 * 1024)
    n_i = ci // ci_t

    grid = (co_pad // co_tile, n_i, b)
    dw, da = pl.pallas_call(
        functools.partial(
            _bwd_w_kernel, n=n, b=b, h=h, w_dim=w_dim, ci_t=ci_t,
            co_tile=co_tile, chunk=chunk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp, ci_t),
                         lambda oi, ii, bi: (bi, 0, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_dim, co_tile),
                         lambda oi, ii, bi: (bi, 0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 3, 3, ci_t, co_tile),
                         lambda oi, ii, bi: (0, 0, 0, ii, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, n), lambda oi, ii, bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # dw tile resident across the inner batch sweep
            pl.BlockSpec((n, 3, 3, ci_t, co_tile),
                         lambda oi, ii, bi: (0, 0, 0, ii, oi),
                         memory_space=pltpu.VMEM),
            # da: same full block every iteration → resident; SMEM because
            # its accumulation is scalar stores
            pl.BlockSpec((b, n), lambda oi, ii, bi: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, 3, ci, co_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
        interpret=interpret,
    )(x_pad, g_scaled, weights, attn)
    return dw[..., :co], da


# ------------------------------------------------- public ops (AD-closed)
#
# Two mutually-recursive custom-VJP ops that are CLOSED under reverse-mode
# differentiation, so the R1 gradient penalty's double-backward (reverse-
# over-reverse) stays on the fused kernels to arbitrary order:
#
#   pconv2d(x, W, a)        = conv2d(x, Σₙ a[b,n]·Wₙ)      (3x3, SAME)
#   pcorr2d(x, g, W, a)     = (dw, da)  where, with the per-sample
#       correlation C[b,ky,kx,i,o] = Σ_{r,c} x_pad[b,r+ky,c+kx,i]·g[b,r,c,o]:
#       dw[n] = Σ_b a[b,n]·C[b]          da[b,n] = Σ W[n]·C[b]
#
# Both ops are multilinear, and each one's VJP is a composition of the two:
#   ∂pconv/∂x → pconv(g, flip(W)ᵀ, a);  ∂pconv/∂(W,a) → pcorr(x, g, W, a)
#   ∂pcorr/∂x → pconv(g, flip(T)ᵀ, ·) with the 2n-bank mixture
#       T[b] = Σₙ a[b,n]·ĝdw[n] + Σₙ ĝda[b,n]·Wₙ  (banks [ĝdw; W],
#       coefficients [a; ĝda]);  ∂pcorr/∂g → pconv(x, [ĝdw; W], [a; ĝda]);
#   ∂pcorr/∂(W,a) → pcorr(x, g, ĝdw, ĝda)  (one call gives both).
#
# Demodulation is deliberately NOT in these ops: it is a per-(b,o) scale
# applied by the caller as a plain jnp multiply (XLA fuses it with the
# neighboring noise/bias/leaky elementwise ops), which keeps the op pair
# trilinear and the closure exact.


def _flip_t(banks):
    """Spatially flip + (i,o)-transpose kernel banks: (n,3,3,i,o)→(n,3,3,o,i)."""
    return jnp.flip(banks, axis=(1, 2)).swapaxes(-1, -2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pconv2d(x, weights, coeff, co_tile=128, interpret=None):
    """out[b] = conv2d(x[b], Σₙ coeff[b,n]·Wₙ), 3x3 SAME, per-sample mix.

    x (b,h,w,i); weights (n,3,3,i,o); coeff (b,n) — NOT softmaxed here.
    """
    interpret = (not pallas_supported()) if interpret is None else interpret
    ones = jnp.ones((x.shape[0], weights.shape[-1]), jnp.float32)
    return _fwd_pallas(x, weights, coeff, ones, co_tile=co_tile,
                       interpret=interpret)


def _pconv_fwd(x, weights, coeff, co_tile, interpret):
    out = pconv2d(x, weights, coeff, co_tile, interpret)
    return out, (x, weights, coeff)


def _pconv_bwd(co_tile, interpret, residuals, g):
    x, weights, coeff = residuals
    g = g.astype(x.dtype)
    dx = pconv2d(g, _flip_t(weights), coeff, co_tile, interpret)
    dw, da = pcorr2d(x, g, weights, coeff, co_tile, interpret)
    return (
        dx.astype(x.dtype),
        dw.astype(weights.dtype),
        da.astype(coeff.dtype),
    )


pconv2d.defvjp(_pconv_fwd, _pconv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pcorr2d(x, g, weights, coeff, co_tile=128, interpret=None):
    """Weight-gradient correlation of a 3x3 SAME conv (see block comment).

    Returns (dw (n,3,3,i,o) fp32, da (b,n) fp32).
    """
    interpret = (not pallas_supported()) if interpret is None else interpret
    b, h, w_dim, ci = x.shape
    n = weights.shape[0]
    co_t = min(co_tile, _round_up(weights.shape[-1], 128))
    ci_t = _ci_tile(ci, n, co_t, budget_bytes=3 * 1024 * 1024)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # large spatial maps: row-chunked windows (g blocks are whole-map —
    # see _block_rows); the kernel's batch-innermost dw accumulation
    # handles the expanded b·n_chunks axis unchanged, da sums per group
    rc = _block_rows(h, w_dim, ci_t, co_t, n, 1)
    if rc < h:
        x_pad, n_ch = _expand_row_windows(x_pad, rc)
        g = g.reshape(b * n_ch, rc, w_dim, g.shape[-1])
        coeff_e = jnp.repeat(coeff, n_ch, axis=0)
        dw, da = _bwd_w_pallas(x_pad, g.astype(x.dtype), weights, coeff_e,
                               co_tile=co_tile, interpret=interpret)
        return dw, da.reshape(b, n_ch, -1).sum(axis=1)
    return _bwd_w_pallas(x_pad, g.astype(x.dtype), weights, coeff,
                         co_tile=co_tile, interpret=interpret)


def _pcorr_fwd(x, g, weights, coeff, co_tile, interpret):
    out = pcorr2d(x, g, weights, coeff, co_tile, interpret)
    return out, (x, g, weights, coeff)


def _pcorr_bwd(co_tile, interpret, residuals, cots):
    x, g, weights, coeff = residuals
    g_dw, g_da = cots
    banks = jnp.concatenate(
        (g_dw.astype(weights.dtype), weights), axis=0
    )  # (2n,3,3,i,o)
    mix = jnp.concatenate(
        (coeff.astype(jnp.float32), g_da.astype(jnp.float32)), axis=1
    )  # (b,2n)
    dx = pconv2d(g, _flip_t(banks), mix, co_tile, interpret)
    dg = pconv2d(x, banks, mix, co_tile, interpret)
    dw_hat, da_hat = pcorr2d(
        x, g, g_dw.astype(weights.dtype), g_da.astype(jnp.float32),
        co_tile, interpret,
    )
    return (
        dx.astype(x.dtype),
        dg.astype(g.dtype),
        dw_hat.astype(weights.dtype),
        da_hat.astype(coeff.dtype),
    )


pcorr2d.defvjp(_pcorr_fwd, _pcorr_bwd)


def fused_adaptive_conv2d(x_mod, weights, attn, demod, co_tile=128,
                          interpret=None):
    """out[b] = demod[b] ⊙ conv2d(x_mod[b], Σₙ attn[b,n]·Wₙ), 3x3, SAME.

    Compatibility wrapper over the AD-closed op pair: the conv runs in the
    fused Pallas kernel; the demod scale is a plain multiply XLA fuses with
    downstream elementwise ops.  Arbitrary-order differentiable.
    """
    out = pconv2d(x_mod, weights, attn, co_tile, interpret)
    return out * demod.astype(out.dtype)[:, None, None, :]
