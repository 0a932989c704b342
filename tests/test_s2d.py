"""Exactness of the space-to-depth conv algebra (ops/s2d.py): every
scattered-kernel form must reproduce the ordinary XLA conv it re-expresses,
up to fp reassociation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu.ops import s2d



def ref_conv(x, w, stride=1):
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestScatteredConv:
    @pytest.fixture(autouse=True, params=["conv", "taps", "blocks"])
    def _conv_mode(self, request, monkeypatch):
        """Run every scattered-conv exactness test under ALL execution
        modes: the native XLA conv, the shifted-matmul ("taps")
        lowering, and the exact-FLOPs block decomposition ("blocks",
        s2d→s2d 3×3 stride-1 only — other forms fall back) — same math,
        alternative lowerings A/B'd on hardware by scripts/bench_s2d.py
        and scripts/trace_s2d.py."""
        monkeypatch.setattr(s2d, "_CONV_MODE", request.param)

    @pytest.mark.parametrize("k,ci,co", [(3, 5, 7), (1, 4, 6), (5, 3, 3)])
    def test_s2d_to_s2d_stride1(self, k, ci, co):
        x = rand(0, (2, 16, 16, ci))
        w = rand(1, (k, k, ci, co))
        want = s2d.to_s2d(ref_conv(x, w))
        got = s2d.s2d_conv(s2d.to_s2d(x), w)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k", [1, 3])
    def test_s2d_to_s2d_stride2(self, k):
        x = rand(2, (2, 16, 16, 6))
        w = rand(3, (k, k, 6, 10))
        want = s2d.to_s2d(ref_conv(x, w, stride=2))
        got = s2d.s2d_conv(s2d.to_s2d(x), w, stride=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_entry_normal_to_s2d(self, k):
        x = rand(4, (2, 16, 16, 3))
        w = rand(5, (k, k, 3, 8))
        want = s2d.to_s2d(ref_conv(x, w))
        got = s2d.s2d_conv(x, w, in_s2d=False)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_s2d_to_normal_stride2(self):
        # residual stride-2 conv exiting to normal layout at half res
        x = rand(6, (2, 16, 16, 6))
        w = rand(7, (1, 1, 6, 12))
        want = ref_conv(x, w, stride=2)
        got = s2d.s2d_conv(s2d.to_s2d(x), w, stride=2, out_s2d=False)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bias_and_exit_roundtrip(self):
        x = rand(8, (2, 16, 16, 4))
        w = rand(9, (3, 3, 4, 5))
        b = rand(10, (5,))
        want = ref_conv(x, w) + b
        got = s2d.s2d_conv(s2d.to_s2d(x), w, bias=b)
        np.testing.assert_allclose(
            s2d.from_s2d(got), want, rtol=1e-5, atol=1e-5
        )

    def test_dense_to_s2d_matches_downsample(self):
        # Downsample = space_to_depth + Dense; in s2d-land it is a Dense,
        # and dense_to_s2d additionally folds the NEXT space_to_depth in.
        x = rand(11, (2, 16, 16, 8))
        w = rand(12, (8, 12))
        b = rand(13, (12,))
        dense_out = jnp.einsum("bhwc,cd->bhwd", x, w) + b
        want = s2d.to_s2d(dense_out)
        got = s2d.dense_to_s2d(x, w, bias=b)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_global_pool_and_gate(self):
        x = rand(14, (2, 16, 16, 6))
        xs = s2d.to_s2d(x)
        np.testing.assert_allclose(
            s2d.s2d_global_pool(xs, keepdims=False),
            jnp.mean(x, axis=(1, 2)),
            rtol=1e-5, atol=1e-6,
        )
        g = rand(15, (2, 1, 1, 6))
        np.testing.assert_allclose(
            s2d.from_s2d(xs * s2d.s2d_gate(g)), x * g,
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_flow(self):
        x = rand(16, (2, 8, 8, 4))
        w = rand(17, (3, 3, 4, 6))

        def f_s2d(w):
            return jnp.sum(s2d.s2d_conv(s2d.to_s2d(x), w) ** 2)

        def f_ref(w):
            return jnp.sum(s2d.to_s2d(ref_conv(x, w)) ** 2)

        np.testing.assert_allclose(
            jax.grad(f_s2d)(w), jax.grad(f_ref)(w), rtol=1e-4, atol=1e-4
        )

    def test_gradients_f32_out_from_bf16(self):
        """The fp32-out-from-bf16 form (adaptive bank mixing) runs under
        a custom VJP in both the scattered and the blocks lowerings —
        its cotangents must match the reference conv's, computed at the
        same operand precision."""
        x = rand(18, (2, 8, 8, 4)).astype(jnp.bfloat16)
        w = rand(19, (3, 3, 4, 6)).astype(jnp.bfloat16)

        def f_s2d(x, w):
            y = s2d.s2d_conv(s2d.to_s2d(x), w, out_dtype=jnp.float32)
            return jnp.sum(y ** 2)

        def f_ref(x, w):
            y = ref_conv(x, w).astype(jnp.float32)
            return jnp.sum(s2d.to_s2d(y) ** 2)

        gx, gw = jax.grad(f_s2d, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
        # bf16 cotangents under different accumulation orders: allow
        # single-ulp outliers on top of the relative band
        np.testing.assert_allclose(
            gx.astype(jnp.float32), rx.astype(jnp.float32),
            rtol=0.1, atol=1.0,
        )
        np.testing.assert_allclose(
            gw.astype(jnp.float32), rw.astype(jnp.float32),
            rtol=0.1, atol=1.0,
        )


class TestS2DUpsample:
    @pytest.mark.parametrize("g,c", [(8, 3), (16, 5), (9, 4)])
    def test_matches_upsample_2x_blur(self, g, c):
        from gigagan_tpu.ops.resample import upsample_2x_blur

        x = rand(20, (2, 2 * g, 2 * g, c))
        want = s2d.to_s2d(upsample_2x_blur(x))
        got = s2d.s2d_upsample_2x_blur(s2d.to_s2d(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_rectangular(self):
        from gigagan_tpu.ops.resample import upsample_2x_blur

        x = rand(21, (1, 16, 24, 2))
        want = s2d.to_s2d(upsample_2x_blur(x))
        got = s2d.s2d_upsample_2x_blur(s2d.to_s2d(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
