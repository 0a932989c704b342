"""Quality-metric tests: Fréchet distance numerics, CLIP-score, and the
CLIP-FID evaluator smoke (mock CLIP weights — the same code path becomes
a real pretrained-feature metric when a checkpoint asset lands on disk;
see gigagan_tpu/eval.py)."""

import numpy as np
import pytest

from gigagan_tpu.eval import (
    QualityEvaluator,
    clip_score,
    frechet_distance,
    gaussian_stats,
)
from gigagan_tpu.models.clip import CLIPConfig, OpenClipAdapter

TINY = CLIPConfig(
    embed_dim=16,
    image_size=32,
    patch_size=8,
    vision_width=24,
    vision_layers=2,
    vision_heads=2,
    context_length=12,
    vocab_size=49408,
    text_width=16,
    text_layers=2,
    text_heads=2,
)


class TestFrechet:
    def test_identical_gaussians_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 8))
        mu, cov = gaussian_stats(x)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-8

    def test_analytic_diagonal_case(self):
        # For diagonal covariances the distance is
        # |mu1-mu2|^2 + sum((sqrt(s1)-sqrt(s2))^2) exactly.
        mu1 = np.array([0.0, 0.0])
        mu2 = np.array([1.0, -2.0])
        c1 = np.diag([4.0, 9.0])
        c2 = np.diag([1.0, 1.0])
        expected = (1.0 + 4.0) + (2.0 - 1.0) ** 2 + (3.0 - 1.0) ** 2
        got = frechet_distance(mu1, c1, mu2, c2)
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_mean_shift_monotone(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=(400, 6))
        mu, cov = gaussian_stats(base)
        d_small = frechet_distance(mu, cov, mu + 0.1, cov)
        d_big = frechet_distance(mu, cov, mu + 1.0, cov)
        assert 0 < d_small < d_big

    def test_symmetry(self):
        rng = np.random.default_rng(2)
        a = gaussian_stats(rng.normal(size=(300, 5)))
        b = gaussian_stats(rng.normal(loc=0.5, scale=2.0, size=(300, 5)))
        d_ab = frechet_distance(*a, *b)
        d_ba = frechet_distance(*b, *a)
        np.testing.assert_allclose(d_ab, d_ba, rtol=1e-8)


class TestClipScore:
    def test_matched_embeds_score_100(self):
        rng = np.random.default_rng(3)
        e = rng.normal(size=(10, 8))
        e /= np.linalg.norm(e, axis=-1, keepdims=True)
        assert clip_score(e, e) == pytest.approx(100.0)

    def test_orthogonal_embeds_score_0(self):
        e1 = np.eye(4)[:2]
        e2 = np.eye(4)[2:]
        assert clip_score(e1, e2) == pytest.approx(0.0)

    def test_negative_cosine_clamped(self):
        e = np.array([[1.0, 0.0]])
        assert clip_score(e, -e) == pytest.approx(0.0)


class TestEvaluator:
    @pytest.fixture(scope="class")
    def ev(self):
        return QualityEvaluator(OpenClipAdapter(name=TINY, seed=0),
                                batch_size=4)

    def test_mock_reasons_surface(self, ev):
        # random-init weights + hash tokenizer ⇒ NOT a real metric, and
        # the evaluator must say so
        assert not ev.is_real
        assert any("random-init" in r for r in ev.mock_reasons)

    def test_embed_images_shape_and_norm(self, ev):
        rng = np.random.default_rng(4)
        imgs = rng.random((6, 32, 32, 3), dtype=np.float32)
        e = ev.embed_images(imgs)
        assert e.shape == (6, TINY.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(e, axis=-1), 1.0, atol=1e-4
        )

    def test_clip_fid_separates_distributions(self, ev):
        rng = np.random.default_rng(5)
        real = rng.random((12, 32, 32, 3), dtype=np.float32)
        same = real + rng.normal(0, 0.01, real.shape).astype(np.float32)
        diff = np.zeros_like(real) + np.linspace(
            0, 1, 12, dtype=np.float32
        ).reshape(-1, 1, 1, 1)
        r_same = ev.clip_fid(real, np.clip(same, 0, 1))
        r_diff = ev.clip_fid(real, diff)
        assert r_same["clip_fid"] < r_diff["clip_fid"]
        assert r_same["n_real"] == r_same["n_fake"] == 12
        assert r_same["clip_is_real"] is False

    def test_clip_score_end_to_end(self, ev):
        rng = np.random.default_rng(6)
        imgs = rng.random((3, 32, 32, 3), dtype=np.float32)
        out = ev.clip_score(imgs, texts=["a", "b", "c"])
        assert 0.0 <= out["clip_score"] <= 100.0
