"""Space-to-depth (s2d) convolution algebra — thin-channel convs at full
lane utilization.

TPU HBM layouts tile the two minor dims to (sublane, 128-lane) vregs, so a
channels-last feature map with c < 128 pays `128/c`× storage and bandwidth
amplification on every materialization.  The discriminator / generator
high-res trunk (256², 128², 64² stages with 3..64 channels) is exactly that
shape, and device traces show those stages running 6-10× off the bandwidth
roofline under XLA (DESIGN.md).

The fix: represent high-res feature maps in **space-to-depth layout** —
``(b, h, w, c) ≡ (b, h/2, w/2, 4c)`` — so 4c fills the lanes.  Every conv
of the original network is **exactly** a conv in s2d space with a
scattered ("block-Toeplitz") kernel built from the original weights:

    Y(fy'+t) = Σ_d W[d] · X(s·(fy'+t) + d − p)        original conv
    X(f·G + s_in) = X'(G)[·, s_in]                     s2d input rep
  ⇒ Y'(y')[t] = Σ_q Ŵ[q, (s_in), (t)] · X'(σy' + q)   conv in s2d space

with σ = s·f_out/f_in and the tap map ``f_in·q + s_in = s·t + d − p``.
The scattered kernel is built per call from a constant 0/1 tap tensor and
one weight-sized einsum — parameters keep the ORIGINAL (kh, kw, ci, co)
layout, so checkpoints and reference weight ports are unchanged.

**Channel ordering is position-major**: s2d channel index = (sy·2+sx)·c +
c_idx, i.e. ``rearrange('b (h sy) (w sx) c -> b h w (sy sx c)')``.  This
differs deliberately from ``ops.resample.space_to_depth``'s channel-major
order: with c minor, the scattered-kernel einsum's output ends in the
full-width ``co`` axis, so its materialization stays weight-sized.  The
first s2d.py draft used channel-major order and its 8-D einsum
intermediates ended in 2-wide minor dims — XLA padded every 2-vector to a
(8, 128) vreg tile and kernel construction alone cost ~14 ms/iter on the
v5e device trace.  Nothing outside this module ever observes the s2d
ordering (entry/exit ops and parameter layouts are order-normalizing).

FLOP cost of the dense scattered kernel vs the original: 4× for an
s2d→s2d 3×3 (half the taps are structural zeros), 16/9× for the
normal→s2d entry form.  The win is therefore gated to genuinely
bandwidth-bound thin-channel stages (see models/discriminator.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from einops import rearrange
from jax import lax

F = 2  # s2d factor


def to_s2d(x):
    """(b, 2h, 2w, c) → (b, h, w, 4c), position-major (sy, sx, c)."""
    return rearrange(
        x, "b (h sy) (w sx) c -> b h w (sy sx c)", sy=F, sx=F
    )


def from_s2d(x):
    """(b, h, w, 4c) → (b, 2h, 2w, c) — inverse of `to_s2d`."""
    return rearrange(
        x, "b h w (sy sx c) -> b (h sy) (w sx) c", sy=F, sx=F
    )


@lru_cache(maxsize=None)
def _axis_taps(k: int, stride: int, in_f: int, out_f: int):
    """Tap tensor for one spatial axis.

    Returns (A, q_min, q_max, sigma) where A[q - q_min, s_in, t, d] = 1 iff
    original tap d of output sub-position t reads input sub-position s_in of
    grid offset q, and sigma is the conv stride in the s2d grid.
    """
    p = (k - 1) // 2  # SAME padding of the original stride-1/2 conv
    num = stride * out_f
    assert num % in_f == 0, (k, stride, in_f, out_f)
    sigma = num // in_f
    entries = []
    for t in range(out_f):
        for d in range(k):
            u = stride * t + d - p
            q, s_in = divmod(u, in_f)
            entries.append((q, s_in, t, d))
    q_min = min(e[0] for e in entries)
    q_max = max(e[0] for e in entries)
    A = np.zeros((q_max - q_min + 1, in_f, out_f, k), np.float32)
    for q, s_in, t, d in entries:
        A[q - q_min, s_in, t, d] = 1.0
    return A, q_min, q_max, sigma


def scatter_kernel(w, *, stride: int = 1, in_s2d: bool = True,
                   out_s2d: bool = True):
    """Build the s2d-space conv kernel from original weights.

    w: (kh, kw, ci, co) HWIO → (KH, KW, in_f²·ci, out_f²·co) HWIO with
    position-major (sy, sx, c) sub-position order on both sides.
    Returns (w_scattered, (pad_h, pad_w), (sigma_h, sigma_w)).
    """
    kh, kw, ci, co = w.shape
    in_f = F if in_s2d else 1
    out_f = F if out_s2d else 1
    Ay, qy0, qy1, sig_y = _axis_taps(kh, stride, in_f, out_f)
    Ax, qx0, qx1, sig_x = _axis_taps(kw, stride, in_f, out_f)
    # W'[Qy,Qx, (s,u,i), (t,v,o)] = Σ_{d,e} Ay[Qy,s,t,d]·Ax[Qx,u,v,e]
    #                                        ·w[d,e,i,o]
    # position-major output order ends the einsum in the full-width co
    # axis, keeping the 8-D intermediate's minor dims dense (see module
    # docstring).
    wp = jnp.einsum(
        "ystd,xuve,deio->yxsuitvo",
        jnp.asarray(Ay, w.dtype), jnp.asarray(Ax, w.dtype), w,
    )
    KY, KX = Ay.shape[0], Ax.shape[0]
    wp = wp.reshape(KY, KX, in_f * in_f * ci, out_f * out_f * co)
    pads = ((-qy0, qy1), (-qx0, qx1))
    return wp, pads, (sig_y, sig_x)


# Execution mode for the scattered conv.  "conv": one
# lax.conv_general_dilated (XLA's native conv path) on the dense
# scattered kernel (4× the original FLOPs for s2d→s2d 3×3).  "taps":
# KY·KX shifted matmuls accumulated in fp32 — same dense kernel, one
# MXU-shaped (b·h·w, CI) @ (CI, CO) dot_general per tap.  "blocks":
# EXACT-FLOPs block decomposition (s2d→s2d 3×3 stride-1 only) — the
# scattered kernel's per-tap (s, t) sub-position support is rectangular
# (full 4×4 at q=(0,0), 2×2 edges, 1×1 corners; DESIGN.md), so the conv
# is exactly 9 matmuls on channel sub-blocks of shifted inputs: 1×
# (4ci→4co) + 4× (2ci→2co) + 4× (ci→co) = the ORIGINAL conv's 36·ci·co
# FLOPs/grid-point instead of the dense form's 144.  Pure XLA ops, so
# autodiff (incl. the R1 double-backward) needs no custom rules.
# "auto" (default) picks per shape from the round-4 v5e device-trace A/B
# (scripts/trace_s2d.py, fwd+bwd ms/app — see the table in DESIGN.md):
# blocks only for TINY-channel eligible forms (ci, co ≤ 8 — G256 blocks
# 0.112 beats taps 0.158 and conv 0.420; wider shapes regress, see
# `_use_blocks`), the polyphase einsum for dense_to_s2d, conv for
# everything else (from_rgb 3→16 conv 0.54 vs taps 23.3).  Module-level
# so the device A/B sweeps can force a mode; overridable at import via
# GIGAGAN_S2D_MODE for end-to-end bench A/Bs.
import os as _os

_CONV_MODE = _os.environ.get("GIGAGAN_S2D_MODE", "auto")


def _pick_mode(wp):
    mode = _CONV_MODE if _CONV_MODE != "blocks" else "auto"
    if mode != "auto":
        return mode
    KY, KX, CI, CO = wp.shape
    return "taps" if (CI <= 32 and CO <= 32) else "conv"


def _use_blocks(kh, kw, stride, in_s2d, out_s2d, ci, co) -> bool:
    """Route to the exact-FLOPs block decomposition?  Only the s2d→s2d
    3×3 stride-1 form has the 4×-inflation the blocks recover — and the
    round-4 device A/B (scripts/trace_s2d.py, fwd+bwd ms/app) shows the
    win only materialises at TINY channels, where the dense scattered
    conv pads lanes anyway: G256 (ci=co=8) blocks 0.112 vs taps 0.158
    vs conv 0.420; wider shapes REGRESS under blocks despite the 4×
    fewer FLOPs (D256 ci=16: conv 0.96 vs blocks 1.82; D128 ci=32:
    0.42 vs 1.22; D64 ci=64: 0.43 vs 0.61) — XLA tiles one dense conv
    better than 9 thin block dots."""
    eligible = (
        kh == 3 and kw == 3 and stride == 1 and in_s2d and out_s2d
    )
    if _CONV_MODE == "blocks":
        return eligible
    return eligible and _CONV_MODE == "auto" and ci <= 8 and co <= 8


def _scattered_conv(x, wp, pads, sigmas, out_dtype=None):
    """Run the scattered conv under the selected execution mode."""
    out_dtype = out_dtype or x.dtype
    if _pick_mode(wp) == "conv":
        return lax.conv_general_dilated(
            x, wp,
            window_strides=sigmas,
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype,
        )
    KY, KX, CI, CO = wp.shape
    (py0, py1), (px0, px1) = pads
    sy, sx = sigmas
    # lax.pad supports the negative (cropping) edges scatter_kernel can
    # produce; jnp.pad does not
    xp = lax.pad(
        x, jnp.zeros((), x.dtype),
        ((0, 0, 0), (py0, py1, 0), (px0, px1, 0), (0, 0, 0)),
    )
    b, hp, wp_, _ = xp.shape
    ho = (hp - KY) // sy + 1
    wo = (wp_ - KX) // sx + 1
    out = None
    for ky in range(KY):
        for kx in range(KX):
            xs = lax.slice(
                xp, (0, ky, kx, 0),
                (b, ky + (ho - 1) * sy + 1, kx + (wo - 1) * sx + 1, CI),
                (1, sy, sx, 1),
            )
            t = jnp.einsum(
                "bhwc,cd->bhwd", xs, wp[ky, kx],
                preferred_element_type=jnp.float32,
            )
            out = t if out is None else out + t
    return out.astype(out_dtype)


from functools import partial as _partial

import jax as _jax


@_partial(_jax.custom_jvp, nondiff_argnums=(2, 3))
def _scattered_conv_f32(x, wp, pads, sigmas):
    """`_scattered_conv` with fp32 output from bf16 operands (free on the
    MXU).  custom_jvp, not custom_vjp, so the op is closed under arbitrary
    further differentiation (same rationale as
    adaptive_conv._conv_f32_out, ADVICE r4 medium): tangents run the
    operand-dtype conv and cast to fp32; transposing that reproduces the
    old backward (cotangent cast to operand dtype — one benign rounding)."""
    return _scattered_conv(x, wp, pads, sigmas, out_dtype=jnp.float32)


@_scattered_conv_f32.defjvp
def _scattered_conv_f32_jvp(pads, sigmas, primals, tangents):
    x, wp = primals
    dx, dwp = tangents
    primal_out = _scattered_conv_f32(x, wp, pads, sigmas)
    dout = (
        _scattered_conv(dx.astype(x.dtype), wp, pads, sigmas)
        .astype(jnp.float32)
        + _scattered_conv(x, dwp.astype(wp.dtype), pads, sigmas)
        .astype(jnp.float32)
    )
    return primal_out, dout


def _s2d_block_conv_impl(x, w, acc_dtype):
    """Exact-FLOPs s2d→s2d 3×3 stride-1 conv: 9 block matmuls on channel
    sub-blocks of grid-shifted inputs (see the mode comment above).

    Derivation (per axis, k=3, stride 1, pad 1, f=2): the tap map is
    s = t + d − 1 with grid offset q = 0 for all four (s, t) pairs
    (d = s − t + 1 ∈ {0, 1, 2}), plus the two stragglers q=−1:
    (s,t,d)=(1,0,0) and q=+1: (0,1,2).  2-D blocks are the tensor
    products: center q=(0,0) full (4ci→4co), four edges (2ci→2co), four
    corners (ci→co) — together exactly the original conv's taps.

    x: (b, g, g, 4ci) position-major; w: (3, 3, ci, co) ORIGINAL weights.
    acc_dtype: dtype the block dots produce and the sums run in.  The
    operand dtype keeps the dot TRANSPOSES in operand precision (an fp32
    preferred type would push fp32 cotangents into every transposed dot —
    a half-rate MXU path); fp32 is for the custom-VJP wrapper below.
    """
    b, gh, gw, c4 = x.shape
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3 and c4 == 4 * ci
    w = w.astype(x.dtype)
    A = jnp.asarray(_axis_taps(3, 1, F, F)[0], x.dtype)
    Ac = A[1]  # center (q=0) axis taps: Ac[s, t, d] = 1 iff d == s-t+1

    # weight blocks (weight-sized einsums, cheap next to the matmuls)
    M_c = jnp.einsum("std,uve,deio->suitvo", Ac, Ac, w).reshape(
        4 * ci, 4 * co
    )
    E_ym = jnp.einsum("uve,eio->uivo", Ac, w[0]).reshape(2 * ci, 2 * co)
    E_yp = jnp.einsum("uve,eio->uivo", Ac, w[2]).reshape(2 * ci, 2 * co)
    E_xm = jnp.einsum("std,dio->sito", Ac, w[:, 0])  # (2, ci, 2, co)
    E_xp = jnp.einsum("std,dio->sito", Ac, w[:, 2])

    xp = lax.pad(
        x, jnp.zeros((), x.dtype),
        ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)),
    )

    def shift(qy, qx, c0=0, c1=None):
        c1 = c4 if c1 is None else c1
        return lax.slice(
            xp, (0, qy + 1, qx + 1, c0), (b, qy + 1 + gh, qx + 1 + gw, c1)
        )

    acc = dict(preferred_element_type=acc_dtype)
    dot = lambda t, m: jnp.einsum("bhwc,cd->bhwd", t, m, **acc)  # noqa: E731

    C = dot(shift(0, 0), M_c)  # (b, g, g, 4co)
    ym = dot(shift(-1, 0, 2 * ci), E_ym)      # sy=1 → ty=0: (b,g,g,2co)
    yp = dot(shift(+1, 0, 0, 2 * ci), E_yp)   # sy=0 → ty=1
    # sx=1 / sx=0 views: position-major channels reshape to (sy, sx, ci)
    xm_in = shift(0, -1).reshape(b, gh, gw, 2, 2, ci)[..., 1, :]
    xp_in = shift(0, +1).reshape(b, gh, gw, 2, 2, ci)[..., 0, :]
    xm = jnp.einsum("bhwsc,sctd->bhwtd", xm_in, E_xm, **acc)  # tx=0
    xpp = jnp.einsum("bhwsc,sctd->bhwtd", xp_in, E_xp, **acc)  # tx=1
    k_mm = dot(shift(-1, -1, 3 * ci), w[0, 0])         # (sy,sx)=(1,1)
    k_mp = dot(shift(-1, +1, 2 * ci, 3 * ci), w[0, 2])  # (1,0)
    k_pm = dot(shift(+1, -1, ci, 2 * ci), w[2, 0])      # (0,1)
    k_pp = dot(shift(+1, +1, 0, ci), w[2, 2])           # (0,0)

    y00 = C[..., :co] + ym[..., :co] + xm[..., 0, :] + k_mm
    y01 = C[..., co:2 * co] + ym[..., co:] + xpp[..., 0, :] + k_mp
    y10 = C[..., 2 * co:3 * co] + yp[..., :co] + xm[..., 1, :] + k_pm
    y11 = C[..., 3 * co:] + yp[..., co:] + xpp[..., 1, :] + k_pp
    return jnp.concatenate((y00, y01, y10, y11), axis=-1)


@_jax.custom_jvp
def _s2d_block_conv_f32(x, w):
    """Block conv with fp32 output from bf16 operands (for the adaptive
    bank mixing).  Same custom-jvp rationale as `_scattered_conv_f32`:
    closed under further differentiation, and the dot TRANSPOSES stay in
    operand precision (an fp32 preferred type on the impl would push fp32
    cotangents into every transposed dot — a half-rate MXU path)."""
    return _s2d_block_conv_impl(x, w, jnp.float32)


@_s2d_block_conv_f32.defjvp
def _s2d_block_conv_f32_jvp(primals, tangents):
    x, w = primals
    dx, dw = tangents
    primal_out = _s2d_block_conv_f32(x, w)
    dout = (
        _s2d_block_conv_impl(dx.astype(x.dtype), w, x.dtype)
        .astype(jnp.float32)
        + _s2d_block_conv_impl(x, dw.astype(w.dtype), x.dtype)
        .astype(jnp.float32)
    )
    return primal_out, dout


def _s2d_block_conv(x, w, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    if out_dtype == jnp.float32 and x.dtype != jnp.float32:
        return _s2d_block_conv_f32(x, w)
    return _s2d_block_conv_impl(x, w, x.dtype).astype(out_dtype)


def s2d_conv(x, w, *, stride: int = 1, in_s2d: bool = True,
             out_s2d: bool = True, bias=None, out_dtype=None):
    """Apply the original conv `w` (kh, kw, ci, co; SAME padding, stride
    1 or 2) to `x` held in s2d layout (or normal layout for the entry
    form), producing s2d (or normal) output.  Exact up to fp
    reassociation.  out_dtype overrides the output dtype (fp32 bank
    outputs for the adaptive-conv mixing — see ops/adaptive_conv.py).
    """
    kh, kw, ci, co = w.shape
    if _use_blocks(kh, kw, stride, in_s2d, out_s2d, ci, co):
        # fp32-out bf16 inputs route through _s2d_block_conv_f32 (a
        # custom_jvp wrapper) so the dot transposes stay in operand
        # precision; same-dtype calls are plain dots XLA differentiates
        # natively
        out = _s2d_block_conv(x, w, out_dtype=out_dtype)
    else:
        wp, pads, sigmas = scatter_kernel(
            w.astype(x.dtype), stride=stride, in_s2d=in_s2d,
            out_s2d=out_s2d
        )
        if out_dtype == jnp.float32 and x.dtype != jnp.float32:
            out = _scattered_conv_f32(x, wp, pads, sigmas)
        else:
            out = _scattered_conv(x, wp, pads, sigmas, out_dtype=out_dtype)
    if bias is not None:
        b = jnp.tile(bias, F * F) if out_s2d else bias
        out = out + b.astype(out.dtype)
    return out


def dense_to_s2d(x, w_dense, bias=None):
    """Fold a per-pixel Dense (cin, cout) applied at grid r into a conv
    producing the s2d layout of the r/2-grid — i.e. Dense + the NEXT
    space-to-depth relayout in one op: (b, r, r, cin) → (b, r/2, r/2,
    4·cout).  Used for `Downsample` when the next stage stays in s2d
    layout (in s2d-land the reference's space-to-depth+1×1 Downsample
    IS a Dense, reference :289-293)."""
    cin, cout = w_dense.shape
    # exact-FLOPs form: the 1×1-Dense-into-s2d is literally "apply the
    # Dense to each of the 4 polyphase sub-grids" — ONE wide-K dot on
    # the s2d view instead of the scattered (2, 2, cin, 4cout) conv whose
    # kernel is 3/4 structural zeros.  Round-4 device A/B
    # (scripts/trace_s2d.py Dds*): the einsum only wins at WIDE channels
    # (cin=256: 0.039 vs 0.063 ms); at the thin big-grid shape the
    # polyphase view's strided access dominates and the scattered conv is
    # 4× faster (cin=64: 0.467 vs 0.117) — so "auto" gates on cin.
    use_einsum = (
        cin >= 256 if _CONV_MODE == "auto" else _CONV_MODE == "blocks"
    )
    if use_einsum:
        b, r, _, _ = x.shape
        g = r // F
        x7 = x.reshape(b, g, F, g, F, cin)
        out = jnp.einsum(
            "bhywxc,cd->bhwyxd", x7, w_dense.astype(x.dtype)
        ).reshape(b, g, g, F * F * cout)
    else:
        wp, pads, sigmas = scatter_kernel(
            w_dense.reshape(1, 1, cin, cout).astype(x.dtype),
            stride=1, in_s2d=False, out_s2d=True,
        )
        out = _scattered_conv(x, wp, pads, sigmas)
    if bias is not None:
        out = out + jnp.tile(bias, F * F).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Upsample (bilinear 2x + binomial blur) in s2d space
#
# The generator's per-stage `Upsample` (reference :257-261) is a per-channel
# linear shift-invariant filter: bilinear 2x (half-pixel centers, edge
# clamp) then [1,2,1]/4 blur (reflect pad), separable per axis.  On the
# interior the per-axis composite is the 6-tap polyphase filter
#   h = up ⊛ blur = [1, 5, 10, 10, 5, 1] / 16      (support -2..3)
# and in s2d space it becomes a conv with lhs_dilation=2 whose taps mix the
# row sub-positions:  y'[N, t] = Σ_u  h[2u + t - 2s] · x'[M, s],  u = N-2M.
# Border behavior (clamp ∘ reflect) is restored EXACTLY by a correction
# matrix C = T_true - T_conv computed once from 1-D operator probes — C is
# nonzero only on the first/last two s2d grid rows.
# ---------------------------------------------------------------------------


def _up1d_matrix(n: int) -> np.ndarray:
    """(2n, n) operator of jax.image.resize bilinear 2x (half-pixel
    centers, edge clamp) along one axis."""
    T = np.zeros((2 * n, n), np.float64)
    for m in range(2 * n):
        src = m / 2.0 - 0.25
        i0 = int(np.floor(src))
        w = src - i0
        a = min(max(i0, 0), n - 1)
        b = min(max(i0 + 1, 0), n - 1)
        T[m, a] += 1.0 - w
        T[m, b] += w
    return T


def _blur1d_matrix(n: int) -> np.ndarray:
    """(n, n) operator of the [1,2,1]/4 blur with reflect padding."""
    T = np.zeros((n, n), np.float64)
    for m in range(n):
        for k, c in ((-1, 0.25), (0, 0.5), (1, 0.25)):
            j = m + k
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            T[m, j] += c
    return T


_H_UP_BLUR = np.array([1, 5, 10, 10, 5, 1], np.float64) / 16.0
_H_OFFSET = -2  # h[j] covers j = m - 2n in [-2, 3]


@lru_cache(maxsize=None)
def _upsample_tables():
    """(h_map, C_top, C_bot): the interior s2d tap map
    h_map[u, s, t] = h[2u + t - 2s] (u in [-2, 2] → index u+2), and the
    border-correction blocks in s2d coordinates:
    C_top[N, t, M, s] = C[2N+t, 2M+s] for the first 2 output / 3 input
    grid rows, C_bot likewise from the end (flipped indexing)."""
    n = 16
    T_true = _blur1d_matrix(2 * n) @ _up1d_matrix(n)
    T_conv = np.zeros_like(T_true)
    for m in range(2 * n):
        for j, c in enumerate(_H_UP_BLUR):
            num = m - (j + _H_OFFSET)
            if num % 2 == 0 and 0 <= num // 2 < n:
                T_conv[m, num // 2] += c
    C = T_true - T_conv
    assert np.abs(C[4:-4]).max() == 0.0, "border corrections wider than 4"
    assert np.abs(C[:4, 4:]).max() == 0.0
    assert np.abs(C[-4:, :-4]).max() == 0.0

    h_map = np.zeros((5, 2, 2), np.float32)  # u+2, s, t
    for u in range(-2, 3):
        for s in range(2):
            for t in range(2):
                j = 2 * u + t - 2 * s - _H_OFFSET
                if 0 <= j < len(_H_UP_BLUR):
                    h_map[u + 2, s, t] = _H_UP_BLUR[j]

    def to_s2d_block(Cblock):  # (4, 6) resolution rows → s2d coords
        out = np.zeros((2, 2, 3, 2), np.float32)
        for N in range(2):
            for t in range(2):
                for M in range(3):
                    for s in range(2):
                        out[N, t, M, s] = Cblock[2 * N + t, 2 * M + s]
        return out

    C_top = to_s2d_block(C[:4, :6])
    # forward-ordered coordinates into the LAST 2 output / 3 input grid rows
    C_bot = to_s2d_block(C[-4:, -6:])
    return h_map, C_top, C_bot


def _upsample_axis(x, axis: int):
    """Apply the composite up+blur filter along one spatial axis of an s2d
    tensor (position-major channels), doubling that axis's grid size.
    axis: 1 (rows, mixes sy) or 2 (cols, mixes sx)."""
    h_map, C_top, C_bot = _upsample_tables()
    b, g1, g2, c4 = x.shape
    c = c4 // 4
    # sub-position factor this axis mixes: rows → sy (major, block 2c),
    # cols → sx (middle, block c)
    if axis == 1:
        rest = 2 * c  # (sx, c) untouched
        view = (2, rest)
    else:
        rest = c
        view = (2, 2, c)  # (sy, sx, c); sx mixed, sy untouched

    # kernel K[k, (s,*), (t,*)] = h_map[u = pl-k, s, t] ⊗ I: correlation
    # semantics put tap u = N-2M at kernel index pl-u (constant — XLA
    # folds the whole construction)
    h_rev = jnp.asarray(h_map[::-1], x.dtype)
    eye = jnp.eye(rest, dtype=x.dtype)
    K = jnp.einsum("ust,cd->usctd", h_rev, eye)
    K = K.reshape(5, 2 * rest, 2 * rest)
    if axis == 2:
        # sx is the middle channel factor: lift K to act per sy block
        eye2 = jnp.eye(2, dtype=x.dtype)
        K = jnp.einsum("ab,uij->uaibj", eye2, K).reshape(5, c4, c4)
    if axis == 1:
        Kc = K[:, None]  # (5, 1, 4c, 4c)
        strides, lhsd, pads = (1, 1), (2, 1), ((2, 3), (0, 0))
    else:
        Kc = K[None]  # (1, 5, 4c, 4c)
        strides, lhsd, pads = (1, 1), (1, 2), ((0, 0), (2, 3))
    y = lax.conv_general_dilated(
        x, Kc, window_strides=strides, padding=pads, lhs_dilation=lhsd,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )

    # border corrections (first/last 2 output grid rows along `axis`)
    def take(t, sl):
        idx = [slice(None)] * 4
        idx[axis] = sl
        return t[tuple(idx)]

    def corr(xb, C):  # xb: 3 grid rows along axis, C: (2,2,3,2)
        if axis == 1:
            v = xb.reshape(b, 3, g2, 2, rest)
            return jnp.einsum(
                "bmwsc,ntms->bnwtc", v, jnp.asarray(C, x.dtype)
            ).reshape(b, 2, g2, c4)
        v = xb.reshape(b, g1, 3, 2, 2, c)
        return jnp.einsum(
            "bhmysc,ntms->bhnytc", v, jnp.asarray(C, x.dtype)
        ).reshape(b, g1, 2, c4)

    top = corr(take(x, slice(0, 3)), C_top)
    bot = corr(take(x, slice(-3, None)), C_bot)
    idx_top = [slice(None)] * 4
    idx_top[axis] = slice(0, 2)
    idx_bot = [slice(None)] * 4
    idx_bot[axis] = slice(-2, None)
    y = y.at[tuple(idx_top)].add(top)
    y = y.at[tuple(idx_bot)].add(bot)
    return y


def s2d_upsample_2x_blur(x):
    """`ops.resample.upsample_2x_blur` computed entirely in s2d layout:
    (b, g, g, 4c) [s2d of (2g, 2g, c)] → (b, 2g, 2g, 4c) [s2d of
    (4g, 4g, c)].  Exact including clamp/reflect border behavior; needs
    g ≥ 4."""
    assert x.shape[1] >= 4 and x.shape[2] >= 4
    x = _upsample_axis(x, 1)
    return _upsample_axis(x, 2)


def s2d_global_pool(x_s2d, keepdims: bool = True):
    """Global spatial mean per ORIGINAL channel of an s2d tensor:
    (b, h, w, 4c) → (b, 1, 1, c) (or (b, c)).  Position-major ordering
    means sub-positions are the MAJOR factor of the channel dim."""
    b, h, w, c4 = x_s2d.shape
    c = c4 // (F * F)
    pooled = jnp.mean(
        x_s2d.reshape(b, h * w, F * F, c), axis=(1, 2)
    )
    return pooled[:, None, None, :] if keepdims else pooled


def s2d_gate(gates):
    """Broadcast per-original-channel gates (..., c) to s2d channels
    (..., 4c) in position-major order."""
    tiles = (1,) * (gates.ndim - 1) + (F * F,)
    return jnp.tile(gates, tiles)
