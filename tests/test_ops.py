"""Unit tests for the functional ops: the decomposed adaptive conv against a
per-sample materialization oracle, attention against naive math, resampling
round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu import ops
from gigagan_tpu.ops.adaptive_conv import adaptive_conv, adaptive_conv_reference


def rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


class TestAdaptiveConv:
    @pytest.mark.parametrize("num_kernels", [1, 2, 4])
    @pytest.mark.parametrize("demod", [True, False])
    def test_matches_per_sample_oracle_2d(self, num_kernels, demod):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        b, h, w, ci, co, k = 3, 8, 8, 6, 10, 3
        x = rand(keys[0], b, h, w, ci)
        weights = rand(keys[1], num_kernels, k, k, ci, co) * 0.2
        mod = rand(keys[2], b, ci)
        kmod = rand(keys[3], b, num_kernels) if num_kernels > 1 else None

        fast = adaptive_conv(x, weights, mod, kmod, demod=demod)
        ref = adaptive_conv_reference(x, weights, mod, kmod, demod=demod)
        np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)

    def test_matches_per_sample_oracle_1d(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        b, t, ci, co, n = 2, 16, 4, 8, 2
        x = rand(keys[0], b, t, ci)
        weights = rand(keys[1], n, 3, ci, co) * 0.2
        mod = rand(keys[2], b, ci)
        kmod = rand(keys[3], b, n)

        fast = adaptive_conv(x, weights, mod, kmod)
        ref = adaptive_conv_reference(x, weights, mod, kmod)
        np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)

    def test_batch_expansion(self):
        """Multiscale D expands batch with scale groups; mod expands
        batch-MAJOR (row i*s+g is sample i, group g) — see expand_batch for
        why this diverges from the reference's scale-major order."""
        keys = jax.random.split(jax.random.PRNGKey(2), 4)
        b, s = 2, 3
        x = rand(keys[0], b * s, 8, 8, 4)
        weights = rand(keys[1], 2, 3, 3, 4, 5) * 0.2
        mod = rand(keys[2], b, 4)
        kmod = rand(keys[3], b, 2)

        out = adaptive_conv(x, weights, mod, kmod)
        # group g of each sample must equal running that group alone with
        # the un-expanded mod
        x5 = x.reshape(b, s, 8, 8, 4)
        out5 = out.reshape(b, s, 8, 8, 5)
        for g in range(s):
            sub = adaptive_conv(x5[:, g], weights, mod, kmod)
            np.testing.assert_allclose(out5[:, g], sub, rtol=2e-4, atol=2e-4)

    def test_1x1_no_demod_is_plain_modulated_conv(self):
        """to_rgb path: 1x1 kernel, single bank, no demod
        (reference: gigagan_pytorch.py:1073)."""
        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        x = rand(keys[0], 2, 4, 4, 6)
        weights = rand(keys[1], 1, 1, 1, 6, 3)
        mod = rand(keys[2], 2, 6)
        out = adaptive_conv(x, weights, mod, None, demod=False)
        expected = jnp.einsum(
            "bhwi,io,bi->bhwo", x, weights[0, 0, 0], mod + 1.0
        )
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)

    def test_grad_flows(self):
        keys = jax.random.split(jax.random.PRNGKey(4), 4)
        x = rand(keys[0], 2, 8, 8, 4)
        weights = rand(keys[1], 2, 3, 3, 4, 4) * 0.2
        mod = rand(keys[2], 2, 4)
        kmod = rand(keys[3], 2, 2)

        def loss(w, m, km):
            return jnp.sum(adaptive_conv(x, w, m, km) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(weights, mod, kmod)
        for g in grads:
            assert jnp.all(jnp.isfinite(g))
            assert float(jnp.abs(g).max()) > 0

    @pytest.mark.parametrize("s2d", [False, True])
    def test_bf16_adaptive_conv_jvp_capable(self, s2d):
        """ADVICE r4 medium: the fp32-out conv wrappers (bf16 operands,
        adaptive bank mixing) must be FORWARD-mode differentiable — the
        opt-in gp_fwd_over_rev R1 path traces jax.jvp through every D
        conv.  Checks jvp/vjp consistency ⟨∂f·t, g⟩ == ⟨t, ∂fᵀ·g⟩ and
        that grad-of-jvp (the hvp structure the GP uses) traces."""
        keys = jax.random.split(jax.random.PRNGKey(5), 6)
        b, r, ci, co = 2, 8, 4, 4
        cin = 4 * ci if s2d else ci
        x = rand(keys[0], b, r, r, cin).astype(jnp.bfloat16)
        weights = (rand(keys[1], 2, 3, 3, ci, co) * 0.2).astype(
            jnp.bfloat16
        )
        mod = rand(keys[2], b, ci)
        kmod = rand(keys[3], b, 2)

        def f(x):
            return adaptive_conv(
                x, weights, mod, kmod, use_pallas=False,
                in_s2d=s2d, out_s2d=s2d,
            ).astype(jnp.float32)

        t = rand(keys[4], *x.shape).astype(jnp.bfloat16)
        y, dy = jax.jvp(f, (x,), (t,))
        assert jnp.all(jnp.isfinite(dy)) and float(
            jnp.abs(dy).max()
        ) > 0
        g = rand(keys[5], *y.shape)
        y2, vjp_fn = jax.vjp(f, x)
        (ct,) = vjp_fn(g)
        np.testing.assert_allclose(
            float(jnp.vdot(dy, g)),
            float(jnp.vdot(ct.astype(jnp.float32),
                           t.astype(jnp.float32))),
            rtol=2e-2,
        )

        # the gp_fwd_over_rev structure: grad of a jvp-derived scalar
        def hvp_scalar(w):
            def phi(x):
                return jnp.sum(
                    adaptive_conv(
                        x, w, mod, kmod, use_pallas=False,
                        in_s2d=s2d, out_s2d=s2d,
                    ).astype(jnp.float32) ** 2
                )

            _, dphi = jax.jvp(phi, (x,), (t,))
            return dphi

        gw = jax.grad(hvp_scalar)(weights)
        assert jnp.all(jnp.isfinite(gw.astype(jnp.float32)))


class TestAttention:
    def test_dot_product_matches_naive(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        q = rand(keys[0], 2, 4, 9, 16)
        k = rand(keys[1], 2, 4, 11, 16)
        v = rand(keys[2], 2, 4, 11, 16)
        out = ops.attend(q, k, v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * 16 ** -0.5
        expected = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim, -1), v)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_l2_distance_similarity(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        q = rand(keys[0], 1, 2, 5, 8)
        k = rand(keys[1], 1, 2, 7, 8)
        out = ops.attend(q, k, k, l2_dist=True)
        dist = jnp.sum((q[:, :, :, None, :] - k[:, :, None, :, :]) ** 2, -1)
        sim = -dist * 8 ** -0.5
        expected = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim, -1), k)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)

    def test_key_padding_mask(self):
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        q = rand(keys[0], 2, 2, 4, 8)
        k = rand(keys[1], 2, 2, 6, 8)
        v = rand(keys[2], 2, 2, 6, 8)
        mask = jnp.array([[True] * 6, [True, True, True, False, False, False]])
        out = ops.attend(q, k, v, mask=mask)
        # row 1 must be identical to attending over only the first 3 keys
        out_trunc = ops.attend(q[1:], k[1:, :, :3], v[1:, :, :3])
        np.testing.assert_allclose(out[1:], out_trunc, rtol=1e-5, atol=1e-5)

    def test_linear_attention_shape_and_finite(self):
        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        q = rand(keys[0], 2, 4, 64, 32)
        k = rand(keys[1], 2, 4, 64, 32)
        v = rand(keys[2], 2, 4, 64, 32)
        out = ops.linear_attend(q, k, v)
        assert out.shape == (2, 4, 64, 32)
        assert jnp.all(jnp.isfinite(out))

    def test_linear_attention_fused_matches_headed(self):
        """linear_attend_fused (native fused-heads layout, per-head
        last-dim slices — the transpose-free form that unblocks the 4K
        upsampler compile) must equal linear_attend on the transposed
        layout."""
        b, h, n, d = 2, 4, 64, 32
        keys = jax.random.split(jax.random.PRNGKey(7), 3)
        q = rand(keys[0], b, n, h * d)
        k = rand(keys[1], b, n, h * d)
        v = rand(keys[2], b, n, h * d)

        def to_headed(t):
            return jnp.moveaxis(t.reshape(b, n, h, d), 2, 1)

        fused = ops.linear_attend_fused(q, k, v, heads=h)
        headed = ops.linear_attend(to_headed(q), to_headed(k), to_headed(v))
        headed = jnp.moveaxis(headed, 1, 2).reshape(b, n, h * d)
        np.testing.assert_allclose(fused, headed, rtol=2e-5, atol=2e-5)

        # grads agree too (the upsampler trains through this op)
        gf = jax.grad(lambda a: jnp.sum(
            ops.linear_attend_fused(a, k, v, heads=h) ** 2))(q)
        gh = jax.grad(lambda a: jnp.sum(
            ops.linear_attend(to_headed(a), to_headed(k),
                              to_headed(v)) ** 2))(q)
        np.testing.assert_allclose(gf, gh, rtol=2e-4, atol=2e-5)


class TestResample:
    def test_blur_preserves_constant(self):
        x = jnp.ones((1, 8, 8, 3))
        np.testing.assert_allclose(ops.blur_2d(x), x, rtol=1e-6)

    def test_blur_kernel_values(self):
        # delta input → kernel appears (away from borders)
        x = jnp.zeros((1, 9, 9, 1)).at[0, 4, 4, 0].set(16.0)
        out = ops.blur_2d(x)
        np.testing.assert_allclose(out[0, 3:6, 3:6, 0],
                                   jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                                             jnp.float32), rtol=1e-5)

    def test_pixel_shuffle_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 12))
        up = ops.pixel_shuffle(x, 2)
        assert up.shape == (2, 8, 8, 3)
        # position (2i+r1, 2j+r2) channel c == input channel c*4 + r1*2 + r2
        np.testing.assert_allclose(up[:, 1::2, 0::2, 2], x[..., 2 * 4 + 2])

    def test_space_to_depth_ordering(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
        out = ops.space_to_depth(x)
        assert out.shape == (1, 2, 2, 12)
        # channel-major: out channel c*4 + s1*2 + s2
        np.testing.assert_allclose(out[0, 0, 0, 1 * 4 + 2], x[0, 1, 0, 1])

    def test_upsample_2x(self):
        x = jnp.ones((1, 4, 4, 2))
        out = ops.upsample_2x(x)
        assert out.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(out, 1.0, rtol=1e-6)

    def test_hf_shuttle(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
        down, hf = ops.downsample_hf_shuttle(x, is_video=False,
                                             skip_downsample=False)
        assert down.shape == (2, 4, 4, 4)
        assert hf.shape == (2, 8, 8, 4)
        np.testing.assert_allclose(hf, x - ops.blur_2d(x), rtol=1e-5, atol=1e-6)

        same, empty = ops.downsample_hf_shuttle(x, is_video=False,
                                                skip_downsample=True)
        assert same.shape == x.shape and empty.shape[-1] == 0

    def test_resize_image_to(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        out = ops.resize_image_to(x, 8)
        assert out.shape == (2, 8, 8, 3)


class TestResizeTorchParity:
    """resize_image_to must match torch F.interpolate EXACTLY (the
    reference resizes reals with it: bilinear for multiscale rgbs
    gigagan_pytorch.py:1683-1687, default-nearest for lowres conditioning
    :2210 and the CLIP adapter open_clip.py:126).  PARITY.md #11 closure."""

    @pytest.fixture(scope="class")
    def torch(self):
        return pytest.importorskip("torch")

    @pytest.mark.parametrize("src,dst", [
        (256, 64), (64, 256), (16, 8), (8, 16), (224, 224), (17, 5),
        (32, 224),
    ])
    def test_bilinear_matches_f_interpolate(self, torch, src, dst):
        rng = np.random.default_rng(src * 1000 + dst)
        x = rng.standard_normal((2, src, src, 3)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), (dst, dst),
            mode="bilinear", align_corners=False, antialias=False,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(ops.resize_image_to(jnp.asarray(x), dst,
                                             "bilinear"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("src,dst", [
        (256, 64), (64, 256), (17, 5), (32, 224), (256, 224),
    ])
    def test_nearest_matches_f_interpolate_default(self, torch, src, dst):
        rng = np.random.default_rng(src + dst)
        x = rng.standard_normal((1, src, src, 2)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), (dst, dst),
        ).permute(0, 2, 3, 1).numpy()  # mode unset == torch default
        got = np.asarray(ops.resize_image_to(jnp.asarray(x), dst,
                                             "nearest"))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("src,dst", [(8, 16), (16, 8), (7, 13)])
    def test_interpolate_1d_matches(self, torch, src, dst):
        rng = np.random.default_rng(src * 31 + dst)
        x = rng.standard_normal((2, src, 4)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 2, 1), dst,
            mode="linear", align_corners=False,
        ).permute(0, 2, 1).numpy()
        got = np.asarray(
            ops.resample.interpolate_1d(jnp.asarray(x), dst)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_antialias_mode_still_available(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        aa = ops.resize_image_to(x, 8, "antialias")
        non_aa = ops.resize_image_to(x, 8, "bilinear")
        assert aa.shape == non_aa.shape == (1, 8, 8, 3)
        assert not np.allclose(np.asarray(aa), np.asarray(non_aa))
