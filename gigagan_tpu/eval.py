"""Quality metrics: CLIP-score and feature-space FID (CLIP-FID).

The north star asks for FID parity with the reference at equal steps
(BASELINE.md), but Inception-V3 weights are unavailable offline.  The
committed substitute (VERDICT r4 item 8):

- **CLIP-FID**: the Fréchet distance between Gaussian fits of CLIP
  image-embedding distributions of a real and a generated image set —
  the standard `clip_fid` variant (Kynkäänniemi et al. 2022 showed it
  tracks Inception FID while being more robust at low sample counts).
- **CLIP-score**: `100 · mean(max(cos(e_img, e_txt), 0))` for
  text-conditional models (Hessel et al. 2021).

Both run through `models.clip.OpenClipAdapter`: drop a real
`laion400m_e32` torch checkpoint on disk (see KNOWN_SHA256_PREFIXES in
models/clip.py) and these become true pretrained-feature metrics; with
no asset they still execute end-to-end on random-init CLIP weights —
numerically meaningless but fully exercisable by tests and smoke runs,
and every result carries `mock_reasons` so a mock-weight number can
never masquerade as a real one.

The reference repo has no evaluation harness at all (its TODO list,
README.md:270, leaves FID unchecked) — this module is new surface.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from gigagan_tpu.utils import exists

__all__ = [
    "gaussian_stats",
    "frechet_distance",
    "clip_score",
    "QualityEvaluator",
]


def gaussian_stats(embeds):
    """Mean and covariance of an (n, d) embedding set (float64 — the
    Fréchet sqrtm is ill-conditioned in float32 at small n)."""
    x = np.asarray(embeds, dtype=np.float64)
    assert x.ndim == 2 and x.shape[0] >= 2, (
        f"need an (n>=2, d) embedding matrix, got {x.shape}"
    )
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6):
    """Fréchet distance between two Gaussians:
    |mu1-mu2|^2 + tr(c1 + c2 - 2 (c1 c2)^{1/2}).

    Standard FID numerics (same guards as pytorch-fid): jitter the
    diagonal when sqrtm fails to produce a finite result, and drop the
    imaginary part when it is numerical noise.
    """
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = mu1 - mu2

    covmean = np.asarray(linalg.sqrtm(cov1 @ cov2))
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = np.asarray(
            linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
        )
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"sqrtm produced a significantly imaginary component "
                f"({np.max(np.abs(covmean.imag))})"
            )
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(cov1) + np.trace(cov2)
        - 2.0 * np.trace(covmean)
    )


def clip_score(image_embeds, text_embeds):
    """CLIPScore = 100 * mean(max(cos, 0)) over matched (image, text)
    rows; both inputs must be l2-normalized (n, d)."""
    ie = np.asarray(image_embeds, np.float64)
    te = np.asarray(text_embeds, np.float64)
    assert ie.shape == te.shape, (ie.shape, te.shape)
    cos = np.sum(ie * te, axis=-1)
    return float(100.0 * np.mean(np.maximum(cos, 0.0)))


class QualityEvaluator:
    """Batches image sets through a CLIP adapter and computes CLIP-FID /
    CLIP-score.  `clip` is an `OpenClipAdapter` (real weights when a
    checkpoint asset exists on disk; random-init otherwise — see
    `mock_reasons`)."""

    def __init__(self, clip, batch_size: int = 32):
        self.clip = clip
        self.batch_size = batch_size

    @property
    def mock_reasons(self) -> List[str]:
        return list(getattr(self.clip, "mock_reasons", []))

    @property
    def is_real(self) -> bool:
        """True when the underlying CLIP runs pretrained weights AND a
        real BPE tokenizer — i.e. the numbers are comparable across
        machines."""
        return not self.mock_reasons

    def embed_images(self, images) -> np.ndarray:
        """(n, h, w, 3) images in [0, 1] (numpy or jax; any h) →
        (n, d) l2-normalized CLIP embeds, batched on device."""
        images = np.asarray(images, np.float32)
        assert images.ndim == 4 and images.shape[-1] == 3, images.shape
        outs = []
        for i in range(0, images.shape[0], self.batch_size):
            embed, _ = self.clip.embed_images(
                images[i: i + self.batch_size]
            )
            outs.append(np.asarray(embed))
        return np.concatenate(outs, axis=0)

    def clip_fid(self, real_images, fake_images) -> dict:
        """CLIP-FID between two image sets; returns the value plus the
        stats provenance (sample counts, real-vs-mock CLIP)."""
        er = self.embed_images(real_images)
        ef = self.embed_images(fake_images)
        fid = frechet_distance(*gaussian_stats(er), *gaussian_stats(ef))
        return {
            "clip_fid": fid,
            "n_real": int(er.shape[0]),
            "n_fake": int(ef.shape[0]),
            "clip_is_real": self.is_real,
            "mock_reasons": self.mock_reasons,
        }

    def clip_score(self, images, texts: Optional[List[str]] = None,
                   text_embeds=None) -> dict:
        assert exists(texts) ^ exists(text_embeds)
        if not exists(text_embeds):
            text_embeds, _ = self.clip.embed_texts(texts)
        score = clip_score(self.embed_images(images),
                           np.asarray(text_embeds))
        return {
            "clip_score": score,
            "clip_is_real": self.is_real,
            "mock_reasons": self.mock_reasons,
        }
