"""The discriminator's space-to-depth trunk (s2d_trunk=True) must be an
exact re-expression: identical parameter pytree, same outputs (up to fp
reassociation) as the plain-layout trunk."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu.models.discriminator import Discriminator

# full-model s2d-vs-plain equivalence (fwd + grads) is compile-bound
pytestmark = pytest.mark.slow


def build(s2d_trunk, **over):
    cfg = dict(
        image_size=64,
        dim_capacity=4,
        dim_max=128,
        attn_resolutions=(8,),
        multiscale_input_resolutions=(16,),
        multiscale_output_skip_stages=1,
        aux_recon_resolutions=(8,),
        aux_recon_patch_dims=(2,),
        aux_recon_frac_patches=(1.0,),
        num_conv_kernels=2,
        num_skip_layers_excite=2,
        unconditional=True,
        s2d_trunk=s2d_trunk,
    )
    cfg.update(over)
    return Discriminator(**cfg)


class TestS2DTrunk:
    def test_stage_flags_engaged(self):
        d = build(True)
        d_bound = d.bind({})  # setup() needs a scope
        flags = d_bound._s2d_flags
        assert any(flags), f"no s2d stages engaged: {flags}"

    def test_params_identical_and_outputs_match(self):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        d_on, d_off = build(True), build(False)
        rgbs = d_on.real_images_to_rgbs(imgs)
        kw = dict(rngs={"dropout": jax.random.PRNGKey(1)})
        init_rngs = {"params": jax.random.PRNGKey(2),
                     "dropout": jax.random.PRNGKey(1)}
        p_on = d_on.init(init_rngs, imgs, rgbs)
        p_off = d_off.init(init_rngs, imgs, rgbs)

        # identical parameter pytrees (paths AND values: same inits)
        flat_on = jax.tree_util.tree_leaves_with_path(p_on)
        flat_off = jax.tree_util.tree_leaves_with_path(p_off)
        assert [k for k, _ in flat_on] == [k for k, _ in flat_off]
        for (k, a), (_, b) in zip(flat_on, flat_off):
            np.testing.assert_array_equal(a, b, err_msg=str(k))

        out_on = d_on.apply(p_on, imgs, rgbs, **kw)
        out_off = d_off.apply(p_off, imgs, rgbs, **kw)
        logits_on, ms_on, aux_on = out_on
        logits_off, ms_off, aux_off = out_off
        np.testing.assert_allclose(logits_on, logits_off,
                                   rtol=2e-4, atol=2e-4)
        assert len(ms_on) == len(ms_off)
        for a, b in zip(ms_on, ms_off):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
        for a, b in zip(aux_on, aux_off):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_grads_match(self):
        imgs = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
        d_on, d_off = build(True), build(False)
        rgbs = d_on.real_images_to_rgbs(imgs)
        kw = dict(rngs={"dropout": jax.random.PRNGKey(1)})
        params = d_on.init({"params": jax.random.PRNGKey(4),
                            "dropout": jax.random.PRNGKey(1)}, imgs, rgbs)

        def loss(model, p, im):
            logits, ms, aux = model.apply(p, im, rgbs, **kw)
            return (jnp.sum(logits ** 2)
                    + sum(jnp.sum(m ** 2) for m in ms)
                    + sum(aux))

        g_on = jax.grad(lambda im: loss(d_on, params, im))(imgs)
        g_off = jax.grad(lambda im: loss(d_off, params, im))(imgs)
        scale = float(jnp.abs(g_off).max()) + 1e-6
        np.testing.assert_allclose(g_on / scale, g_off / scale,
                                   rtol=5e-4, atol=5e-4)

    def test_nonmonotone_s2d_boundary(self):
        """Attention at an intermediate resolution forces a normal-rep
        stage between two s2d stages — exercises the in_s2d=False /
        out_s2d=True Downsample and residual forms."""
        imgs = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 128, 3))
        over = dict(image_size=128, attn_resolutions=(64,),
                    multiscale_input_resolutions=(32,))
        d_on, d_off = build(True, **over), build(False, **over)
        flags = d_on.bind({})._s2d_flags
        # expect: s2d at 128 (stage0), normal at 64 (attn), s2d at 32
        assert flags[0] and not flags[1] and flags[2], flags
        rgbs = d_on.real_images_to_rgbs(imgs)
        kw = dict(rngs={"dropout": jax.random.PRNGKey(1)})
        params = d_on.init({"params": jax.random.PRNGKey(6),
                            "dropout": jax.random.PRNGKey(1)}, imgs, rgbs)
        out_on = d_on.apply(params, imgs, rgbs, **kw)
        out_off = d_off.apply(params, imgs, rgbs, **kw)
        np.testing.assert_allclose(out_on[0], out_off[0],
                                   rtol=2e-4, atol=2e-4)
