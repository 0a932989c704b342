"""Pallas fused adaptive-conv kernel: interpret-mode parity against both the
per-sample oracle and the XLA decomposition, forward and all four gradients.
(The TPU-compiled path is exercised by bench.py / the verify drives.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu.ops.adaptive_conv import (
    adaptive_conv,
    adaptive_conv_reference,
    demod_scale,
)
from gigagan_tpu.ops.pallas.adaptive_conv import fused_adaptive_conv2d


def build_inputs(seed=0, b=3, h=8, w=8, ci=16, co=24, n=2):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (b, h, w, ci))
    weights = jax.random.normal(ks[1], (n, 3, 3, ci, co)) * 0.2
    mod = jax.random.normal(ks[2], (b, ci))
    kmod = jax.random.normal(ks[3], (b, n))
    return x, weights, mod, kmod


def fused_inputs(x, weights, mod, kmod):
    attn = jax.nn.softmax(kmod, -1)
    scale_in = mod + 1.0
    x_mod = x * scale_in[:, None, None, :]
    demod = demod_scale(weights, scale_in, attn)
    return x_mod, attn, demod


class TestFusedForward:
    def test_matches_reference(self):
        x, weights, mod, kmod = build_inputs()
        x_mod, attn, demod = fused_inputs(x, weights, mod, kmod)
        out = fused_adaptive_conv2d(x_mod, weights, attn, demod, 128, True)
        ref = adaptive_conv_reference(x, weights, mod, kmod)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

    def test_via_adaptive_conv_flag(self):
        x, weights, mod, kmod = build_inputs(seed=1)
        out = adaptive_conv(x, weights, mod, kmod, use_pallas=True)
        ref = adaptive_conv(x, weights, mod, kmod, use_pallas=False)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

    def test_no_demod(self):
        x, weights, mod, kmod = build_inputs(seed=2)
        out = adaptive_conv(x, weights, mod, kmod, demod=False,
                            use_pallas=True)
        ref = adaptive_conv(x, weights, mod, kmod, demod=False,
                            use_pallas=False)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

    def test_single_bank(self):
        x, weights, mod, _ = build_inputs(seed=3, n=1)
        out = adaptive_conv(x, weights, mod, None, use_pallas=True)
        ref = adaptive_conv(x, weights, mod, None, use_pallas=False)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

    def test_wide_channels_tiled(self):
        # co > co_tile exercises the output tiling path
        x, weights, mod, kmod = build_inputs(seed=4, ci=8, co=160)
        x_mod, attn, demod = fused_inputs(x, weights, mod, kmod)
        out = fused_adaptive_conv2d(x_mod, weights, attn, demod, 128, True)
        ref = adaptive_conv_reference(x, weights, mod, kmod)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


class TestFusedGradients:
    def test_all_grads_match_xla(self):
        x, weights, mod, kmod = build_inputs(seed=5)
        x_mod, attn, demod = fused_inputs(x, weights, mod, kmod)

        def loss_fused(x_mod, weights, attn, demod):
            return jnp.sum(
                fused_adaptive_conv2d(x_mod, weights, attn, demod, 128,
                                      True) ** 2
            )

        def loss_xla(x_mod, weights, attn, demod):
            n, _, _, ci, co = weights.shape
            b, h, w, _ = x_mod.shape
            outs = jax.lax.conv_general_dilated(
                x_mod,
                jnp.moveaxis(weights, 0, -2).reshape(3, 3, ci, n * co),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, h, w, n, co)
            mixed = jnp.einsum("bn,bhwno->bhwo", attn, outs)
            return jnp.sum((mixed * demod[:, None, None, :]) ** 2)

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
            x_mod, weights, attn, demod
        )
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(
            x_mod, weights, attn, demod
        )
        for name, a, b_ in zip(("dx", "dw", "da", "dd"), g_f, g_x):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=1e-4, atol=1e-4,
                err_msg=f"gradient {name} mismatch",
            )

    def test_grad_through_full_op(self):
        """End-to-end: jax.grad through adaptive_conv(use_pallas=True) must
        match use_pallas=False including the mod/demod chain rules."""
        x, weights, mod, kmod = build_inputs(seed=6)

        def loss(use_pallas):
            def f(x, w, m, km):
                return jnp.sum(
                    adaptive_conv(x, w, m, km, use_pallas=use_pallas) ** 2
                )
            return f

        g_p = jax.grad(loss(True), argnums=(0, 1, 2, 3))(
            x, weights, mod, kmod
        )
        g_x = jax.grad(loss(False), argnums=(0, 1, 2, 3))(
            x, weights, mod, kmod
        )
        for name, a, b_ in zip(("dx", "dw", "dmod", "dkmod"), g_p, g_x):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"gradient {name} mismatch",
            )

    def test_row_chunked_large_spatial(self, monkeypatch):
        """Large spatial maps run on row-chunked windows (halo
        pre-expansion); force chunking at test size and check forward AND
        all gradients against the XLA path."""
        from gigagan_tpu.ops.pallas import adaptive_conv as pc

        monkeypatch.setattr(
            pc, "_block_rows", lambda h, *a, **k: max(h // 4, 1)
        )
        x, weights, mod, kmod = build_inputs(seed=7, h=16, w=8)

        def loss(use_pallas):
            def f(x, w, m, km):
                return jnp.sum(
                    adaptive_conv(x, w, m, km, use_pallas=use_pallas) ** 2
                )
            return f

        out = adaptive_conv(x, weights, mod, kmod, use_pallas=True)
        ref = adaptive_conv(x, weights, mod, kmod, use_pallas=False)
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)

        g_p = jax.grad(loss(True), argnums=(0, 1, 2, 3))(
            x, weights, mod, kmod
        )
        g_x = jax.grad(loss(False), argnums=(0, 1, 2, 3))(
            x, weights, mod, kmod
        )
        for name, a, b_ in zip(("dx", "dw", "dmod", "dkmod"), g_p, g_x):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"gradient {name} mismatch",
            )


class TestL2NormStability:
    def test_zero_row_backward_is_finite(self):
        """sqrt(0) gradient regression: zero-masked token rows must not NaN
        the backward (seen as the step-1 bf16 NaN in conditional training)."""
        from gigagan_tpu.models.layers import l2norm

        x = jnp.zeros((4, 8), jnp.bfloat16).at[0].set(1.0)
        g = jax.grad(
            lambda t: jnp.sum(l2norm(t).astype(jnp.float32) ** 2)
        )(x)
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


class TestFlashAttention:
    def _qkv(self, seed=0, b=2, h=2, nq=9, nk=11, d=16):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (b, h, nq, d))
        k = jax.random.normal(ks[1], (b, h, nk, d))
        v = jax.random.normal(ks[2], (b, h, nk, d))
        return q, k, v

    @pytest.mark.parametrize("l2", [False, True])
    def test_forward_matches_math(self, l2):
        from gigagan_tpu.ops.attention import attend
        from gigagan_tpu.ops.pallas.flash_attention import flash_attend

        q, k, v = self._qkv()
        mask = jnp.ones((2, 11), bool).at[1, 7:].set(False)
        ref = attend(q, k, v, mask=mask, l2_dist=l2, use_flash=False)
        out = flash_attend(q, k, v, mask, l2, None, True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("l2", [False, True])
    def test_grads_match_math(self, l2):
        from gigagan_tpu.ops.attention import attend
        from gigagan_tpu.ops.pallas.flash_attention import flash_attend

        q, k, v = self._qkv(seed=1)
        mask = jnp.ones((2, 11), bool).at[0, 9:].set(False)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attend(q, k, v, mask, l2, None, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(
                attend(q, k, v, mask=mask, l2_dist=l2, use_flash=False) ** 2
            )

        g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", g_f, g_r):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_shared_qk_grads(self):
        """SelfAttention(dot_product=False) passes k=q — gradient must sum
        both paths through the custom VJP."""
        from gigagan_tpu.ops.attention import attend
        from gigagan_tpu.ops.pallas.flash_attention import flash_attend

        q, _, v = self._qkv(seed=2, nq=8, nk=8)

        def loss_flash(q, v):
            return jnp.sum(flash_attend(q, q, v, None, True, None, True) ** 2)

        def loss_ref(q, v):
            return jnp.sum(
                attend(q, q, v, l2_dist=True, use_flash=False) ** 2
            )

        g_f = jax.grad(loss_flash, argnums=(0, 1))(q, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1))(q, v)
        for name, a, b_ in zip(("q", "v"), g_f, g_r):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )


@pytest.mark.slow
class TestFlashSecondOrder:
    """The grad-of-jvp (hvp) kernel pair (ops/pallas/flash_attention_hv)
    must match XLA autodiff exactly: jvp outputs AND the reverse of the
    jvp — the R1 forward-over-reverse structure."""

    @pytest.mark.parametrize("l2,use_mask", [
        (True, False), (False, False), (True, True),
    ])
    def test_jvp_and_grad_of_jvp_match_xla(self, l2, use_mask):
        from gigagan_tpu.ops.attention import attend
        from gigagan_tpu.ops.pallas.flash_attention_hv import (
            flash_attend_hv,
        )

        b, n, nk, h, d = 2, 32, 33, 2, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        q = jax.random.normal(ks[0], (b, h, n, d))
        k = jax.random.normal(ks[1], (b, h, nk, d))
        v = jax.random.normal(ks[2], (b, h, nk, d))
        tq = jax.random.normal(ks[3], (b, h, n, d))
        tk = jax.random.normal(ks[4], (b, h, nk, d))
        tv = jax.random.normal(ks[5], (b, h, nk, d))
        mask = (
            (jax.random.uniform(ks[6], (b, nk)) > 0.3) if use_mask
            else None
        )

        def f_ref(q, k, v):
            return attend(q, k, v, mask=mask, l2_dist=l2, use_flash=False)

        def f_hv(q, k, v):
            return flash_attend_hv(q, k, v, mask, l2, None, True)

        o1, t1 = jax.jvp(f_ref, (q, k, v), (tq, tk, tv))
        o2, t2 = jax.jvp(f_hv, (q, k, v), (tq, tk, tv))
        np.testing.assert_allclose(o2, o1, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(t2, t1, rtol=1e-5, atol=1e-5)

        def s(f):
            def inner(q, k, v):
                out, tout = jax.jvp(f, (q, k, v), (tq, tk, tv))
                return jnp.sum(tout ** 2) + jnp.sum(out ** 3)
            return inner

        g1 = jax.grad(s(f_ref), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(s(f_hv), argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", g1, g2):
            scale = float(jnp.abs(a).max()) + 1e-6
            np.testing.assert_allclose(
                b_ / scale, a / scale, rtol=1e-5, atol=1e-5,
                err_msg=f"grad-of-jvp d{name} mismatch",
            )


class TestFlashAutoDispatch:
    """attend(use_flash=None) dispatch rules: flash only on TPU at winning
    sizes (≥256 query tokens), never inside a flash_disabled() trace (the
    flash VJP is first-order; R1 double-backward needs second order)."""

    def test_auto_false_off_tpu(self):
        from gigagan_tpu.ops.pallas import flash_attention as fa

        q = jnp.zeros((1, 2, 2048, 64))
        k = jnp.zeros((1, 2, 2048, 64))
        if jax.devices()[0].platform == "tpu":
            pytest.skip("CPU-dispatch test")
        assert fa.flash_auto(q, k) is False

    def test_auto_respects_size_gate(self, monkeypatch):
        from gigagan_tpu.ops.pallas import flash_attention as fa

        monkeypatch.setattr(fa, "pallas_supported", lambda: True)
        big_q = jnp.zeros((1, 2, 1024, 64))
        big_k = jnp.zeros((1, 2, 1024, 64))
        small_q = jnp.zeros((1, 2, 256, 64))
        tiny_q = jnp.zeros((1, 2, 64, 64))
        text_k = jnp.zeros((1, 2, 77, 64))
        wide_q = jnp.zeros((1, 2, 2048, 256))
        assert fa.flash_auto(big_q, big_k) is True
        assert fa.flash_auto(small_q, big_k) is True   # 256 tokens: flash
        assert fa.flash_auto(tiny_q, big_k) is False   # 64 tokens: XLA
        assert fa.flash_auto(big_q, text_k) is False   # tiny kv: XLA
        assert fa.flash_auto(wide_q, big_k) is False   # d>128: XLA

    def test_flash_disabled_wins(self, monkeypatch):
        from gigagan_tpu.ops.pallas import flash_attention as fa

        monkeypatch.setattr(fa, "pallas_supported", lambda: True)
        q = jnp.zeros((1, 2, 1024, 64))
        with fa.flash_disabled():
            assert fa.flash_auto(q, q) is False
        assert fa.flash_auto(q, q) is True

    def test_second_order_grad_through_attend_auto(self):
        """grad-of-grad through attend with default dispatch must work on
        every platform — the steps' R1 path relies on flash_disabled()
        around its vjp traces, and the XLA path is ∞-differentiable."""
        from gigagan_tpu.ops.attention import attend
        from gigagan_tpu.ops.pallas.flash_attention import flash_disabled

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 8))

        def inner(x):
            with flash_disabled():
                out, vjp = jax.vjp(
                    lambda t: attend(t, t, t), x
                )
                (gx,) = vjp(jnp.ones_like(out))
            return jnp.sum(gx * gx)

        gg = jax.grad(inner)(q)
        assert jnp.all(jnp.isfinite(gg))


class TestFusedHeadsAttention:
    """The fused-heads kernel (ops/pallas/flash_attention_fused) takes
    q/k/v in the network's (b, n, H·d) layout — no head transposes, null
    KV handled analytically — and must match the split-heads math path
    (values and grads, incl. the null_kv parameter gradient)."""

    def _qkv(self, seed=0, b=2, heads=3, nq=16, nk=24, d=8):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        q = jax.random.normal(ks[0], (b, nq, heads * d))
        k = jax.random.normal(ks[1], (b, nk, heads * d))
        v = jax.random.normal(ks[2], (b, nk, heads * d))
        null_kv = jax.random.normal(ks[3], (2, heads, d))
        return q, k, v, null_kv

    @pytest.mark.parametrize("l2,with_null", [
        (True, True), (False, True), (False, False), (True, False),
    ])
    def test_forward_matches_fallback(self, l2, with_null):
        from gigagan_tpu.ops.attention import attend_fused
        from gigagan_tpu.ops.pallas.flash_attention_fused import (
            flash_attend_fused,
        )

        q, k, v, null_kv = self._qkv()
        null = null_kv if with_null else None
        ref = attend_fused(
            q, k, v, heads=3, null_kv=null, l2_dist=l2, use_flash=False
        )
        out = flash_attend_fused(q, k, v, null, 3, l2, None, True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("l2", [True, False])
    def test_grads_match_fallback(self, l2):
        from gigagan_tpu.ops.attention import attend_fused
        from gigagan_tpu.ops.pallas.flash_attention_fused import (
            flash_attend_fused,
        )

        q, k, v, null_kv = self._qkv(seed=1)

        def loss_fused(q, k, v, nkv):
            return jnp.sum(
                flash_attend_fused(q, k, v, nkv, 3, l2, None, True) ** 2
            )

        def loss_ref(q, k, v, nkv):
            return jnp.sum(
                attend_fused(
                    q, k, v, heads=3, null_kv=nkv, l2_dist=l2,
                    use_flash=False,
                ) ** 2
            )

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        for name, a, b_ in zip(("q", "k", "v", "null_kv"), g_f, g_r):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_shared_qk_grads(self):
        """SelfAttention's shared q/k path through the fused kernel."""
        from gigagan_tpu.ops.attention import attend_fused
        from gigagan_tpu.ops.pallas.flash_attention_fused import (
            flash_attend_fused,
        )

        q, _, v, null_kv = self._qkv(seed=2, nq=16, nk=16)

        def loss_fused(q, v, nkv):
            return jnp.sum(
                flash_attend_fused(q, q, v, nkv, 3, True, None, True) ** 2
            )

        def loss_ref(q, v, nkv):
            return jnp.sum(
                attend_fused(
                    q, q, v, heads=3, null_kv=nkv, l2_dist=True,
                    use_flash=False,
                ) ** 2
            )

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, v, null_kv)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, v, null_kv)
        for name, a, b_ in zip(("q", "v", "null_kv"), g_f, g_r):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )

    def test_fallback_matches_legacy_module_math(self):
        """attend_fused's fallback (split heads + null concat + attend)
        must equal the pre-round-3 SelfAttention inner math — guards the
        module rewrite against semantic drift."""
        from einops import rearrange, repeat

        from gigagan_tpu.ops.attention import attend, attend_fused

        heads, d = 3, 8
        q, k, v, null_kv = self._qkv(seed=3, heads=heads, d=d)
        got = attend_fused(
            q, k, v, heads=heads, null_kv=null_kv, l2_dist=True,
            use_flash=False,
        )

        b, nq, _ = q.shape
        qh, kh, vh = (
            rearrange(t, "b n (h d) -> b h n d", h=heads) for t in (q, k, v)
        )
        nk_tok, nv_tok = (
            repeat(t, "h d -> b h 1 d", b=b) for t in null_kv
        )
        kh = jnp.concatenate((nk_tok, kh), axis=-2)
        vh = jnp.concatenate((nv_tok, vh), axis=-2)
        ref = attend(qh, kh, vh, l2_dist=True, scale=d ** -0.5,
                     use_flash=False)
        ref = rearrange(ref, "b h n d -> b n (h d)")
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_head_group_grid_path(self):
        """heads=8, d=64 → head groups of 2 (lane extent 128): the
        production G/D geometry exercises the (batch, group) grid."""
        from gigagan_tpu.ops.attention import attend_fused
        from gigagan_tpu.ops.pallas.flash_attention_fused import (
            flash_attend_fused,
            head_group,
        )

        assert head_group(8, 64) == 2
        q, k, v, null_kv = self._qkv(seed=4, b=2, heads=8, nq=16, nk=16,
                                     d=64)

        def loss_fused(q, k, v, nkv):
            return jnp.sum(
                flash_attend_fused(q, k, v, nkv, 8, True, None, True) ** 2
            )

        def loss_ref(q, k, v, nkv):
            return jnp.sum(
                attend_fused(
                    q, k, v, heads=8, null_kv=nkv, l2_dist=True,
                    use_flash=False,
                ) ** 2
            )

        out = flash_attend_fused(q, k, v, null_kv, 8, True, None, True)
        ref = attend_fused(q, k, v, heads=8, null_kv=null_kv, l2_dist=True,
                           use_flash=False)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        for name, a, b_ in zip(("q", "k", "v", "null_kv"), g_f, g_r):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} mismatch",
            )

@pytest.mark.slow
class TestSecondOrderFusedAttention:
    """The differentiation-closed fused-heads family
    (ops/pallas/flash_attention_so): forward, first-order backward
    (`flash_bwd_so` primal), and the adjoint-of-backward kernel must match
    XLA autodiff of the exact split-heads fallback — including the
    reverse-over-reverse R1 structure the default GP step traces."""

    def _qkv(self, seed=0, b=2, heads=3, nq=16, nk=24, d=8):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        q = jax.random.normal(ks[0], (b, nq, heads * d))
        k = jax.random.normal(ks[1], (b, nk, heads * d))
        v = jax.random.normal(ks[2], (b, nk, heads * d))
        null_kv = jax.random.normal(ks[3], (2, heads, d))
        g = jax.random.normal(ks[4], (b, nq, heads * d))
        return q, k, v, null_kv, g

    @staticmethod
    def _ref(heads, l2, null):
        from gigagan_tpu.ops.attention import attend_fused

        def f(q, k, v, nkv):
            return attend_fused(
                q, k, v, heads=heads,
                null_kv=(nkv if null else None),
                l2_dist=l2, use_flash=False,
            )
        return f

    @pytest.mark.parametrize("l2,with_null", [
        (True, True), (False, True), (True, False), (False, False),
    ])
    def test_backward_primal_matches_xla_vjp(self, l2, with_null):
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            _so_fwd_op,
            flash_bwd_so,
        )

        q, k, v, null_kv, g = self._qkv()
        null = null_kv if with_null else None
        lse = _so_fwd_op(q, k, v, null, 3, l2, None, True)[1]
        got = flash_bwd_so(q, k, v, null, g, lse, 3, l2, None, True)
        _, vjp = jax.vjp(self._ref(3, l2, with_null), q, k, v, null_kv)
        want = vjp(g)
        names = ("dq", "dk", "dv", "dnull")
        for name, a, b_ in zip(names, got, want):
            if a is None:
                assert not with_null
                continue
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"{name} mismatch",
            )

    @pytest.mark.parametrize("l2,with_null", [
        (True, True), (False, True), (True, False), (False, False),
    ])
    def test_adjoint_of_backward_matches_xla(self, l2, with_null):
        """Differentiate a weighted sum of the backward's outputs w.r.t.
        every input — exercises the full `_bwd2_kernel` adjoint."""
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            _so_fwd_op,
            flash_bwd_so,
        )

        q, k, v, null_kv, g = self._qkv(seed=1)
        null = null_kv if with_null else None
        ks = jax.random.split(jax.random.PRNGKey(99), 4)
        wq = jax.random.normal(ks[0], q.shape)
        wk = jax.random.normal(ks[1], k.shape)
        wv = jax.random.normal(ks[2], v.shape)
        wn = jax.random.normal(ks[3], null_kv.shape)

        def loss_so(q, k, v, nkv, g):
            # lse computed in-trace, as production does (its cotangent is
            # structurally zero — the adjoint encodes the full softmax
            # derivative)
            null = nkv if with_null else None
            lse = _so_fwd_op(q, k, v, null, 3, l2, None, True)[1]
            dq, dk, dv, dn = flash_bwd_so(
                q, k, v, null, g, lse, 3, l2, None, True,
            )
            out = (jnp.sum(wq * dq) + jnp.sum(wk * dk)
                   + jnp.sum(wv * dv))
            if with_null:
                out = out + jnp.sum(wn * dn)
            return out

        def loss_ref(q, k, v, nkv, g):
            _, vjp = jax.vjp(self._ref(3, l2, with_null), q, k, v, nkv)
            dq, dk, dv, dn = vjp(g)
            out = (jnp.sum(wq * dq) + jnp.sum(wk * dk)
                   + jnp.sum(wv * dv))
            if with_null:
                out = out + jnp.sum(wn * dn)
            return out

        g_so = jax.grad(loss_so, argnums=(0, 1, 2, 3, 4))(
            q, k, v, null_kv, g
        )
        g_rf = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            q, k, v, null_kv, g
        )
        for name, a, b_ in zip(("cq", "ck", "cv", "cnull", "cg"),
                               g_so, g_rf):
            if name == "cnull" and not with_null:
                continue
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=3e-4, atol=3e-4,
                err_msg=f"{name} mismatch",
            )

    @pytest.mark.parametrize("l2", [True, False])
    def test_r1_reverse_over_reverse_matches_xla(self, l2):
        """The exact GP structure of steps.py's default branch: vjp through
        the attention, squared-norm penalty on the input gradient, outer
        grad w.r.t. every operand (incl. the hinge term on the primal
        output riding the same tape)."""
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            flash_attend_so,
        )

        q, k, v, null_kv, _ = self._qkv(seed=2)
        ref = self._ref(3, l2, True)

        def r1(f):
            def inner(q, k, v, nkv):
                out, vjp = jax.vjp(
                    lambda x: f(x, k, v, nkv), q
                )
                (gx,) = vjp(jnp.ones_like(out))
                return (jnp.sum(gx.astype(jnp.float32) ** 2)
                        + jnp.sum(out ** 2))
            return inner

        f_so = lambda q_, k_, v_, n_: flash_attend_so(
            q_, k_, v_, n_, 3, l2, None, True
        )
        g_so = jax.grad(r1(f_so), argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        g_rf = jax.grad(r1(ref), argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        for name, a, b_ in zip(("q", "k", "v", "null"), g_so, g_rf):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=3e-4, atol=3e-4,
                err_msg=f"R1 d{name} mismatch",
            )

    def test_r1_shared_qk(self):
        """SelfAttention's shared-q/k L2 geometry (the production D path)
        under reverse-over-reverse, grads w.r.t. the shared projection."""
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            flash_attend_so,
        )

        q, _, v, null_kv, _ = self._qkv(seed=3, nq=16, nk=16)
        ref = self._ref(3, True, True)

        def r1(f):
            def inner(qk, v, nkv):
                out, vjp = jax.vjp(lambda x: f(x, x, v, nkv), qk)
                (gx,) = vjp(jnp.ones_like(out))
                return jnp.sum(gx.astype(jnp.float32) ** 2)
            return inner

        f_so = lambda q_, k_, v_, n_: flash_attend_so(
            q_, k_, v_, n_, 3, True, None, True
        )
        g_so = jax.grad(r1(f_so), argnums=(0, 1, 2))(q, v, null_kv)
        g_rf = jax.grad(r1(ref), argnums=(0, 1, 2))(q, v, null_kv)
        for name, a, b_ in zip(("qk", "v", "null"), g_so, g_rf):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=3e-4, atol=3e-4,
                err_msg=f"shared-qk R1 d{name} mismatch",
            )

    @pytest.mark.parametrize("budget", [1, 10 ** 9])
    def test_budget_extremes_exact(self, budget, monkeypatch):
        """The VMEM chunk budgets are hardware-tuned module knobs
        (_BWD_BUDGET/_BWD2_BUDGET/_FWD_BUDGET); exactness must hold at the
        degenerate extremes — the minimum 8-row chunk and one whole-nq
        chunk — since budget sweeps on the device move through them."""
        import gigagan_tpu.ops.pallas.flash_attention_fused as ff
        import gigagan_tpu.ops.pallas.flash_attention_so as so
        from gigagan_tpu.ops.pallas.flash_attention_so import (
            flash_attend_so,
        )

        monkeypatch.setattr(so, "_BWD_BUDGET", budget)
        monkeypatch.setattr(so, "_BWD2_BUDGET", budget)
        monkeypatch.setattr(ff, "_FWD_BUDGET", max(budget, 8 * 32 * 4))

        q, k, v, null_kv, _ = self._qkv(seed=4)
        ref = self._ref(3, True, True)

        def r1(f):
            def inner(q, k, v, nkv):
                out, vjp = jax.vjp(lambda x: f(x, k, v, nkv), q)
                (gx,) = vjp(jnp.ones_like(out))
                return (jnp.sum(gx.astype(jnp.float32) ** 2)
                        + jnp.sum(out ** 2))
            return inner

        f_so = lambda q_, k_, v_, n_: flash_attend_so(
            q_, k_, v_, n_, 3, True, None, True
        )
        g_so = jax.grad(r1(f_so), argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        g_rf = jax.grad(r1(ref), argnums=(0, 1, 2, 3))(q, k, v, null_kv)
        for name, a, b_ in zip(("q", "k", "v", "null"), g_so, g_rf):
            scale = float(jnp.abs(b_).max()) + 1e-6
            np.testing.assert_allclose(
                a / scale, b_ / scale, rtol=3e-4, atol=3e-4,
                err_msg=f"budget={budget} R1 d{name} mismatch",
            )
