"""The generator's space-to-depth trunk must be an exact re-expression:
identical parameter pytree, same outputs (up to fp reassociation) as the
plain-layout path — including the per-pixel noise stream."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu.models.generator import Generator

# full-model s2d-vs-plain equivalence (fwd + grads) is compile-bound
pytestmark = pytest.mark.slow


def build(s2d_trunk):
    return Generator(
        image_size=128,
        dim_capacity=2,
        dim_max=64,
        style_network=dict(dim=32, depth=1),
        self_attn_resolutions=(16,),
        cross_attn_resolutions=(),
        num_conv_kernels=2,
        num_skip_layers_excite=2,
        unconditional=True,
        s2d_trunk=s2d_trunk,
    )


class TestS2DGenerator:
    def test_flags_engaged(self):
        g = build(True)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
        }
        params = g.init(rngs, batch_size=1)
        flags = g.bind(params)._s2d_flags
        assert any(flags), flags

    def test_outputs_match(self):
        g_on, g_off = build(True), build(False)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
        }
        kwargs = dict(batch_size=2, return_all_rgbs=True)
        p_on = g_on.init(rngs, **kwargs)
        p_off = g_off.init(rngs, **kwargs)

        flat_on = jax.tree_util.tree_leaves_with_path(p_on)
        flat_off = jax.tree_util.tree_leaves_with_path(p_off)
        assert [k for k, _ in flat_on] == [k for k, _ in flat_off]
        for (k, a), (_, b) in zip(flat_on, flat_off):
            np.testing.assert_array_equal(a, b, err_msg=str(k))

        apply_rngs = {"latent": jax.random.PRNGKey(3),
                      "noise": jax.random.PRNGKey(4)}
        out_on, rgbs_on = g_on.apply(p_on, rngs=apply_rngs, **kwargs)
        out_off, rgbs_off = g_off.apply(p_off, rngs=apply_rngs, **kwargs)
        np.testing.assert_allclose(out_on, out_off, rtol=2e-4, atol=2e-4)
        assert len(rgbs_on) == len(rgbs_off)
        for a, b in zip(rgbs_on, rgbs_off):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_grads_match(self):
        g_on, g_off = build(True), build(False)
        rngs = {
            "params": jax.random.PRNGKey(5),
            "latent": jax.random.PRNGKey(6),
            "noise": jax.random.PRNGKey(7),
        }
        params = g_on.init(rngs, batch_size=2)
        apply_rngs = {"latent": jax.random.PRNGKey(8),
                      "noise": jax.random.PRNGKey(9)}

        def loss(model, p):
            out = model.apply(p, rngs=apply_rngs, batch_size=2)
            return jnp.sum(out ** 2)

        g1 = jax.grad(lambda p: loss(g_on, p))(params)
        g2 = jax.grad(lambda p: loss(g_off, p))(params)

        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2),
        ):
            scale = float(jnp.abs(b).max()) + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=1e-3, atol=1e-3, err_msg=str(k),
            )
