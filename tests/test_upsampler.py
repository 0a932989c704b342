"""UnetUpsampler tests: image path, video path, rgb pyramid contract,
mod-table exhaustion, D-compatibility of allowable resolutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu.models.unet_upsampler import UnetUpsampler


def rngs(seed=0):
    a, b, c = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {"params": a, "noise": b, "latent": c}


def small_upsampler(**overrides):
    kwargs = dict(
        dim=8,
        image_size=32,
        input_image_size=8,
        dim_mults=(1, 2),
        full_attn=(False, True),
        cross_attn=(False, False),
        attn_depths=(1, 1),
        temporal_attn_depths=(1, 1),
        num_conv_kernels=2,
        unconditional=True,
        style_network=dict(dim=16, depth=1),
    )
    kwargs.update(overrides)
    return UnetUpsampler(**kwargs)


class TestUnetUpsamplerImage:
    @pytest.fixture(scope="class")
    def model(self):
        m = small_upsampler()
        lowres = jnp.zeros((2, 8, 8, 3))
        params = m.init(rngs(), lowres)
        return m, params

    def test_upsamples_4x(self, model):
        m, params = model
        lowres = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
        out = m.apply(params, lowres, rngs=rngs(2))
        assert out.shape == (2, 32, 32, 3)
        assert jnp.all(jnp.isfinite(out))

    def test_rgb_pyramid_contract(self, model):
        """return_all_rgbs: only rgbs larger than the input, with the true
        lowres input prepended (reference: unet_upsampler.py:884-897)."""
        m, params = model
        lowres = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
        out, rgbs = m.apply(params, lowres, return_all_rgbs=True,
                            rngs=rngs(2))
        sizes = [t.shape[-2] for t in rgbs]
        assert sizes[0] == 8  # the lowres input itself
        np.testing.assert_allclose(rgbs[0], lowres)
        assert all(s > 8 for s in sizes[1:])
        assert sizes[-1] == 32

    def test_allowable_rgb_resolutions(self, model):
        m, _ = model
        assert m.allowable_rgb_resolutions == [8, 16]

    def test_explicit_styles(self, model):
        m, params = model
        lowres = jnp.zeros((2, 8, 8, 3))
        styles = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
        out = m.apply(params, lowres, styles=styles,
                      rngs={"noise": jax.random.PRNGKey(4)})
        assert out.shape == (2, 32, 32, 3)


@pytest.mark.slow
class TestUnetUpsamplerVideo:
    @pytest.fixture(scope="class")
    def model(self):
        m = small_upsampler(has_temporal_layers=True)
        lowres = jnp.zeros((1, 4, 8, 8, 3))  # (b, t, h, w, c)
        params = m.init(rngs(), lowres)
        return m, params

    def test_video_upsample(self, model):
        m, params = model
        vid = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 8, 8, 3))
        out = m.apply(params, vid, rngs=rngs(2))
        # 2 up stages double time twice; one downsample stage pools it once:
        # t: 4 → (stage0 skip-down, stage1 pools) 2 → up 4 → 8
        assert out.shape[0] == 1 and out.shape[-3:] == (32, 32, 3)
        assert jnp.all(jnp.isfinite(out))

    def test_image_through_video_net(self, model):
        """Image inputs skip the temporal mod slots via ModTable.skip
        (reference islice at :761-762,867-868)."""
        m, params = model
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
        out = m.apply(params, img, rngs=rngs(2))
        assert out.shape == (2, 32, 32, 3)


class TestUpsamplerConditional:
    def test_text_conditioned(self):
        m = small_upsampler(
            unconditional=False,
            cross_attn=(False, True),
            text_encoder=dict(dim=16, depth=1, clip_dim=24),
            style_network=dict(dim=16, depth=1, dim_text_latent=16),
        )
        lowres = jnp.zeros((2, 8, 8, 3))
        enc = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 24))
        params = m.init(rngs(), lowres, text_encodings=enc)
        out = m.apply(params, lowres, text_encodings=enc, rngs=rngs(1))
        assert out.shape == (2, 32, 32, 3)
