"""Generator / Discriminator structural tests: shapes, rgb pyramid,
multiscale batch expansion, conditioning plumbing, exhaustion invariants."""

import jax
import jax.numpy as jnp
import pytest

from gigagan_tpu.models import (
    Discriminator,
    Generator,
    StyleNetwork,
    TextEncoder,
)

IMAGE_SIZE = 32  # small pyramid: stages at 4, 8, 16, 32


def g_rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    a, b, c = jax.random.split(k, 3)
    return {"params": a, "noise": b, "latent": c}


@pytest.fixture(scope="module")
def uncond_generator():
    g = Generator(
        image_size=IMAGE_SIZE,
        dim_capacity=4,
        dim_max=64,
        dim_latent=32,
        style_network=dict(dim=32, depth=2),
        self_attn_resolutions=(16,),
        cross_attn_resolutions=(),
        num_conv_kernels=2,
        unconditional=True,
    )
    params = g.init(g_rngs(), batch_size=2)
    return g, params


class TestGenerator:
    def test_output_shape_and_rgb_pyramid(self, uncond_generator):
        g, params = uncond_generator
        out, rgbs = g.apply(
            params, batch_size=2, return_all_rgbs=True, rngs=g_rngs(1)
        )
        assert out.shape == (2, IMAGE_SIZE, IMAGE_SIZE, 3)
        # one rgb per stage, at the stage resolution (pre-upsample)
        assert [r.shape[1] for r in rgbs] == [4, 8, 16, 32]
        assert all(r.shape[-1] == 3 for r in rgbs)
        # final output is the last accumulated rgb
        assert jnp.allclose(out, rgbs[-1])

    def test_explicit_styles(self, uncond_generator):
        g, params = uncond_generator
        styles = jax.random.normal(jax.random.PRNGKey(0), (3, 32))
        out = g.apply(params, styles=styles, rngs={"noise": jax.random.PRNGKey(1)})
        assert out.shape == (3, IMAGE_SIZE, IMAGE_SIZE, 3)

    def test_deterministic_given_same_rngs(self, uncond_generator):
        g, params = uncond_generator
        out1 = g.apply(params, batch_size=2, rngs=g_rngs(7))
        out2 = g.apply(params, batch_size=2, rngs=g_rngs(7))
        assert jnp.allclose(out1, out2)
        out3 = g.apply(params, batch_size=2, rngs=g_rngs(8))
        assert not jnp.allclose(out1, out3)

    def test_conditional_generator(self):
        dim_text = 32
        g = Generator(
            image_size=16,
            dim_capacity=4,
            dim_max=32,
            dim_latent=16,
            style_network=dict(dim=16, depth=1, dim_text_latent=dim_text),
            text_encoder=dict(dim=dim_text, depth=1, clip_dim=24),
            self_attn_resolutions=(),
            cross_attn_resolutions=(8,),
            num_conv_kernels=2,
            unconditional=False,
        )
        text_encodings = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 24))
        # zero-pad the tail to exercise the any-nonzero mask
        text_encodings = text_encodings.at[:, 5:].set(0.0)
        params = g.init(g_rngs(), text_encodings=text_encodings, batch_size=2)
        out = g.apply(
            params, text_encodings=text_encodings, batch_size=2,
            rngs=g_rngs(1),
        )
        assert out.shape == (2, 16, 16, 3)


class TestDiscriminator:
    @pytest.fixture(scope="class")
    def uncond_d(self):
        d = Discriminator(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=64,
            attn_resolutions=(16,),
            multiscale_input_resolutions=(16, 8),
            aux_recon_resolutions=(8,),
            aux_recon_patch_dims=(2,),
            aux_recon_frac_patches=(0.25,),
            num_conv_kernels=2,
            unconditional=True,
        )
        images = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3))
        rgbs = d.real_images_to_rgbs(images)
        params = d.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            images, rgbs,
        )
        return d, params

    def test_logits_and_multiscale(self, uncond_d):
        d, params = uncond_d
        images = jax.random.normal(
            jax.random.PRNGKey(2), (2, IMAGE_SIZE, IMAGE_SIZE, 3)
        )
        rgbs = d.real_images_to_rgbs(images)
        logits, ms, aux = d.apply(
            params, images, rgbs, rngs={"dropout": jax.random.PRNGKey(3)},
        )
        # each multiscale input doubles the batch → 4 scale groups
        assert logits.shape == (4, 2)
        # multiscale outputs at 16//2=8 and 8//2=4
        assert len(ms) == 2
        assert ms[0].shape[1] == 8 and ms[1].shape[1] == 4
        assert len(aux) == 1 and aux[0].shape == ()
        assert jnp.all(jnp.isfinite(logits))

    def test_no_multiscale_no_aux(self, uncond_d):
        d, params = uncond_d
        images = jax.random.normal(
            jax.random.PRNGKey(2), (2, IMAGE_SIZE, IMAGE_SIZE, 3)
        )
        rgbs = d.real_images_to_rgbs(images)
        logits, ms, aux = d.apply(
            params, images, rgbs,
            return_multiscale_outputs=False, calc_aux_loss=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert logits.shape == (4, 2)
        assert ms == [] and aux == []

    def test_missing_rgb_resolution_asserts(self, uncond_d):
        d, params = uncond_d
        images = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3))
        with pytest.raises(AssertionError, match="necessary resolutions"):
            d.apply(
                params, images, [],
                rngs={"dropout": jax.random.PRNGKey(3)},
            )

    def test_conditional_discriminator(self):
        d = Discriminator(
            image_size=16,
            dim_capacity=4,
            dim_max=32,
            attn_resolutions=(),
            multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(),
            aux_recon_patch_dims=(),
            aux_recon_frac_patches=(),
            num_conv_kernels=2,
            unconditional=False,
            text_encoder=dict(dim=16, depth=1, clip_dim=24),
        )
        images = jnp.zeros((2, 16, 16, 3))
        rgbs = d.real_images_to_rgbs(images)
        encodings = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 24))
        params = d.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            images, rgbs, text_encodings=encodings,
        )
        logits, ms, _ = d.apply(
            params, images, rgbs, text_encodings=encodings,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert logits.shape == (2, 2)
        assert len(ms) == 1


class TestConditioning:
    def test_style_network(self):
        sn = StyleNetwork(dim=16, depth=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        params = sn.init(jax.random.PRNGKey(1), x)
        out = sn.apply(params, x)
        assert out.shape == (4, 16)

    def test_text_encoder_masking(self):
        te = TextEncoder(dim=16, depth=1, clip_dim=24)
        enc = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 24))
        enc = enc.at[:, 4:].set(0.0)
        params = te.init(jax.random.PRNGKey(1), enc)
        glob, fine, mask = te.apply(params, enc)
        assert glob.shape == (2, 16)
        assert fine.shape == (2, 7, 16)
        assert mask.shape == (2, 7)
        assert bool(mask[:, :4].all()) and not bool(mask[:, 4:].any())
