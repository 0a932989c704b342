"""JAX CLIP (ViT-B/32 by default) with structural layer taps.

Replaces the reference's open_clip dependency (open_clip.py:17-158), which
captures intermediate activations via forward hooks: here every visual
resblock output is a structural return value — no hooks, jit-native.

Pieces:
- `CLIPTextTower` / `CLIPVisionTower` / `CLIPModel`: flax modules matching
  open_clip's ViT-B/32 quickgelu architecture
- `SimpleTokenizer`: CLIP BPE when a bpe vocab file is available;
  `HashTokenizer`: deterministic offline fallback (documented — adequate for
  training plumbing/tests; load the real vocab for production text)
- `load_open_clip_torch_checkpoint`: maps an open_clip torch state_dict onto
  the flax tree (for porting laion400m_e32 etc. when a checkpoint file is
  on disk; this image has no network egress to download one)
- `OpenClipAdapter`: the reference-API wrapper — embed_texts / embed_images /
  contrastive_loss with the same return contracts (masked token encodings,
  (L, b, n, d) visual taps, l2-normed embeds).
"""

from __future__ import annotations

import gzip
import hashlib
import html
import re
from dataclasses import dataclass
from functools import lru_cache, partial
from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gigagan_tpu.utils import exists

Dtype = Any

OPENAI_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    quick_gelu: bool = True


VIT_B_32 = CLIPConfig()

CONFIGS = {
    "ViT-B/32": VIT_B_32,
    "ViT-B-32": VIT_B_32,
    "ViT-B/16": CLIPConfig(patch_size=16),
    "ViT-L/14": CLIPConfig(
        embed_dim=768, patch_size=14, vision_width=1024, vision_layers=24,
        vision_heads=16, text_width=768, text_layers=12, text_heads=12,
    ),
}


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    quick_gelu_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.width,
            dtype=self.dtype,
            name="attn",
        )(h, h, mask=mask)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=self.dtype)(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h) if self.quick_gelu_act else jax.nn.gelu(
            h, approximate=False
        )
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    config: CLIPConfig = VIT_B_32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        cfg = self.config
        b, n = ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.text_width, dtype=self.dtype,
                       name="token_embedding")(ids)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width),
        )
        x = tok + pos[None, :n].astype(tok.dtype)

        causal = nn.make_causal_mask(ids)
        for i in range(cfg.text_layers):
            x = ResidualAttentionBlock(
                cfg.text_width, cfg.text_heads, cfg.quick_gelu,
                dtype=self.dtype, name=f"resblock_{i}",
            )(x, mask=causal)

        encodings = nn.LayerNorm(epsilon=1e-5, name="ln_final", dtype=self.dtype)(x)

        # pooled feature at the EOS position (highest token id, open_clip
        # convention) projected to the joint space
        eos_idx = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(
            encodings, eos_idx[:, None, None], axis=1
        )[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(cfg.text_width ** -0.5),
            (cfg.text_width, cfg.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype), encodings


class CLIPVisionTower(nn.Module):
    config: CLIPConfig = VIT_B_32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (b, H, W, 3), already resized + CLIP-normalized.
        Returns (embed (b, embed_dim), taps (L, b, 1+n, width))."""
        cfg = self.config
        x = nn.Conv(
            cfg.vision_width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(cfg.vision_width ** -0.5),
            (cfg.vision_width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, w)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(cfg.vision_width ** -0.5),
            (1 + (cfg.image_size // cfg.patch_size) ** 2, cfg.vision_width),
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=self.dtype)(x)

        taps = []
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(
                cfg.vision_width, cfg.vision_heads, cfg.quick_gelu,
                dtype=self.dtype, name=f"resblock_{i}",
            )(x)
            taps.append(x)

        pooled = nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=self.dtype)(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(cfg.vision_width ** -0.5),
            (cfg.vision_width, cfg.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype), jnp.stack(taps)


class CLIPModel(nn.Module):
    config: CLIPConfig = VIT_B_32
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTower(self.config, dtype=self.dtype)
        self.text = CLIPTextTower(self.config, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(1 / 0.07),
                                        jnp.float32),
            (),
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, ids):
        return self.text(ids)

    def __call__(self, images, ids):
        img_embed, _ = self.visual(images)
        txt_embed, _ = self.text(ids)
        return img_embed, txt_embed, self.logit_scale


# --------------------------------------------------------------- tokenizers

SOT_ID = 49406
EOT_ID = 49407


@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text):
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text):
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer; requires the bpe_simple_vocab_16e6.txt(.gz)
    merges file on disk."""

    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        path = Path(bpe_path)
        raw = (
            gzip.open(path, "rt", encoding="utf-8").read()
            if path.suffix == ".gz"
            else path.read_text(encoding="utf-8")
        )
        merges = raw.split("\n")[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[^\s\w]+|\w+",
            re.IGNORECASE,
        )

    def _bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.context_length), np.int32)
        for row, text in enumerate(texts):
            text = _whitespace_clean(_basic_clean(text)).lower()
            ids = [SOT_ID]
            for token in re.findall(self.pat, text):
                token = "".join(
                    self.byte_encoder[b] for b in token.encode("utf-8")
                )
                ids.extend(
                    self.encoder[t] for t in self._bpe(token).split(" ")
                )
            ids.append(EOT_ID)
            ids = ids[: self.context_length]
            ids[-1] = EOT_ID if len(ids) == self.context_length else ids[-1]
            out[row, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic offline fallback: word → stable-hash id.  Keeps the
    full (sot, ..., eot, pad) contract so downstream masking works; NOT a
    real CLIP vocabulary — use SimpleTokenizer with the bpe file for
    production text conditioning."""

    def __init__(self, context_length: int = 77,
                 vocab_size: int = 49408):
        self.context_length = context_length
        self.vocab_size = vocab_size

    def _word_id(self, word: str) -> int:
        h = int(hashlib.md5(word.encode()).hexdigest(), 16)
        return 1 + h % (self.vocab_size - 3)

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.context_length), np.int32)
        for row, text in enumerate(texts):
            words = re.findall(r"\w+", text.lower())
            ids = [SOT_ID, *map(self._word_id, words)]
            ids = ids[: self.context_length - 1]
            ids.append(EOT_ID)
            out[row, : len(ids)] = ids
        return out


# ------------------------------------------------------- torch weight port

# sha256 prefixes of the reference's pretrained assets, for offline
# verification of dropped-in files (reference downloads at runtime,
# open_clip.py:21-28; this image has no egress).  open_clip's release
# filenames embed the first 8 hex chars of the file's sha256 — e.g.
# vit_b_32-laion400m_e32-46683a32.pt.
KNOWN_SHA256_PREFIXES = {
    ("ViT-B/32", "laion400m_e32"): "46683a32",
}


def file_sha256(path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(chunk), b""):
            h.update(blk)
    return h.hexdigest()


def verify_checkpoint_checksum(path, expected: Optional[str] = None):
    """Checksum-verify a dropped-in CLIP checkpoint.

    `expected` is a sha256 prefix (>= 8 hex chars).  When omitted, it is
    recovered from the open_clip release filename convention
    `*-<sha256[:8]>.pt` if the file matches it; files with no recoverable
    expectation pass with a note (the hash is still computed and
    returned so callers can pin it).  Raises ValueError on mismatch.
    """
    path = Path(str(path))
    actual = file_sha256(path)
    if expected is None:
        m = re.search(r"-([0-9a-f]{8,64})\.(?:pt|bin|pth)$", path.name)
        expected = m.group(1) if m else None
    if expected is not None and not actual.startswith(expected.lower()):
        raise ValueError(
            f"CLIP checkpoint {path} sha256 mismatch: expected prefix "
            f"{expected!r}, file hashes to {actual[:16]}…  (corrupt "
            "download or wrong file)"
        )
    return actual


def load_open_clip_torch_checkpoint(path, config: CLIPConfig = VIT_B_32):
    """Map an open_clip torch state_dict (as saved by open_clip /
    downloaded laion weights) onto the flax CLIPModel param tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return map_open_clip_state_dict(
        {k: np.asarray(v.float().numpy()) for k, v in sd.items()}, config
    )


def _attn_params(sd, prefix, width, heads):
    """torch nn.MultiheadAttention (packed qkv) → flax MHDPA tree."""
    head_dim = width // heads
    w = sd[f"{prefix}.attn.in_proj_weight"]  # (3w, w)
    b = sd[f"{prefix}.attn.in_proj_bias"]
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)

    def fmt(wm, bm):
        # torch (out=w, in=w) → flax (in=w, heads, head_dim)
        return {
            "kernel": wm.T.reshape(width, heads, head_dim),
            "bias": bm.reshape(heads, head_dim),
        }

    ow = sd[f"{prefix}.attn.out_proj.weight"]
    ob = sd[f"{prefix}.attn.out_proj.bias"]
    return {
        "query": fmt(qw, qb),
        "key": fmt(kw, kb),
        "value": fmt(vw, vb),
        "out": {
            "kernel": ow.T.reshape(heads, head_dim, width),
            "bias": ob,
        },
    }


def _block_params(sd, prefix, width, heads):
    return {
        "ln_1": {
            "scale": sd[f"{prefix}.ln_1.weight"],
            "bias": sd[f"{prefix}.ln_1.bias"],
        },
        "ln_2": {
            "scale": sd[f"{prefix}.ln_2.weight"],
            "bias": sd[f"{prefix}.ln_2.bias"],
        },
        "attn": _attn_params(sd, prefix, width, heads),
        "mlp_fc": {
            "kernel": sd[f"{prefix}.mlp.c_fc.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_fc.bias"],
        },
        "mlp_proj": {
            "kernel": sd[f"{prefix}.mlp.c_proj.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_proj.bias"],
        },
    }


def map_open_clip_state_dict(sd, config: CLIPConfig = VIT_B_32):
    cfg = config
    visual = {
        "patch_embed": {
            # torch conv (out, in, kh, kw) → flax (kh, kw, in, out)
            "kernel": np.transpose(
                sd["visual.conv1.weight"], (2, 3, 1, 0)
            ),
        },
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
    }
    for i in range(cfg.vision_layers):
        visual[f"resblock_{i}"] = _block_params(
            sd, f"visual.transformer.resblocks.{i}",
            cfg.vision_width, cfg.vision_heads,
        )

    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {
            "scale": sd["ln_final.weight"],
            "bias": sd["ln_final.bias"],
        },
        "text_projection": sd["text_projection"],
    }
    for i in range(cfg.text_layers):
        text[f"resblock_{i}"] = _block_params(
            sd, f"transformer.resblocks.{i}",
            cfg.text_width, cfg.text_heads,
        )

    return {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"],
    }


# ------------------------------------------------------------- the adapter

class OpenClipAdapter:
    """Reference-API adapter (open_clip.py:17-158) over the JAX CLIP.

    Frozen: params live OUTSIDE any model's trainable tree.  embed_texts
    returns (l2norm global embed, per-token encodings zero-masked past EOS);
    embed_images returns (l2norm embed, (L, b, n, d) per-layer encodings).
    """

    def __init__(
        self,
        name: str = "ViT-B/32",
        pretrained: Optional[str] = None,  # path to a torch checkpoint
        tokenizer_name: str = "ViT-B-32-quickgelu",
        eos_id: int = EOT_ID,
        bpe_path: Optional[str] = None,
        dtype: Dtype = jnp.float32,
        seed: int = 0,
        expected_sha256: Optional[str] = None,
        verify_checksum: bool = True,
    ):
        self.config = CONFIGS[name] if isinstance(name, str) else name
        self.eos_id = eos_id
        self.model = CLIPModel(self.config, dtype=dtype)

        self.has_pretrained_weights = (
            exists(pretrained) and Path(str(pretrained)).exists()
        )
        if self.has_pretrained_weights:
            if verify_checksum:
                expected = expected_sha256 or KNOWN_SHA256_PREFIXES.get(
                    (name if isinstance(name, str) else "", "laion400m_e32")
                    if "laion400m_e32" in Path(str(pretrained)).name
                    else ("", "")
                )
                digest = verify_checkpoint_checksum(pretrained, expected)
                print(
                    f"[gigagan_tpu] CLIP checkpoint sha256 "
                    f"{digest[:16]}… "
                    + ("verified" if expected else "(no pin — recorded)")
                )
            params = load_open_clip_torch_checkpoint(
                pretrained, self.config
            )
            params = jax.tree.map(jnp.asarray, params)
        else:
            if exists(pretrained):
                print(
                    f"[gigagan_tpu] CLIP checkpoint {pretrained!r} not "
                    "found on disk — using random init (no network egress "
                    "to download pretrained weights)"
                )
            ids = jnp.zeros((1, self.config.context_length), jnp.int32)
            imgs = jnp.zeros(
                (1, self.config.image_size, self.config.image_size, 3)
            )
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), imgs, ids
            )["params"]
        self.params = params

        if exists(bpe_path) and Path(bpe_path).exists():
            self.tokenizer = SimpleTokenizer(
                bpe_path, self.config.context_length
            )
        else:
            self.tokenizer = HashTokenizer(
                self.config.context_length, self.config.vocab_size
            )

        self._encode_text = jax.jit(
            lambda p, ids: self.model.apply(
                {"params": p}, ids, method=CLIPModel.encode_text
            )
        )
        self._encode_image = jax.jit(
            lambda p, images: self.model.apply(
                {"params": p}, images, method=CLIPModel.encode_image
            )
        )

    # ----------------------------------------------------------- properties

    @property
    def uses_hash_tokenizer(self):
        return isinstance(self.tokenizer, HashTokenizer)

    @property
    def mock_reasons(self):
        """Why this adapter is a degraded stand-in for the reference's
        pretrained laion400m_e32 CLIP (open_clip.py:21-28) — empty when
        real weights + a real BPE vocab are loaded."""
        reasons = []
        if not self.has_pretrained_weights:
            reasons.append(
                "random-init CLIP weights (no checkpoint on disk)"
            )
        if self.uses_hash_tokenizer:
            reasons.append(
                "HashTokenizer fallback (no BPE vocab on disk) — token "
                "ids are hashes, not CLIP's vocabulary"
            )
        return reasons

    @property
    def dim_latent(self):
        return self.config.text_width

    @property
    def _dim_image_latent(self):
        return self.config.vision_width

    @property
    def image_size(self):
        return self.config.image_size

    @property
    def image_channels(self):
        return 3

    @property
    def max_text_len(self):
        return self.config.context_length

    @property
    def logit_scale(self):
        return float(jnp.exp(self.params["logit_scale"]))

    # ------------------------------------------------------------ embedding

    def tokenize(self, texts: List[str]):
        return jnp.asarray(self.tokenizer(texts))

    @staticmethod
    def text_mask_from_ids(ids, eos_id: int = EOT_ID):
        """Mask covering sot..eos inclusive (reference:
        open_clip.py:112-115)."""
        is_eos = ids == eos_id
        excluding_eos = jnp.cumsum(is_eos, axis=-1) == 0
        mask = jnp.pad(
            excluding_eos[:, :-1], ((0, 0), (1, 0)), constant_values=True
        )
        return mask & (ids != 0)

    def embed_texts(self, texts: List[str]):
        ids = self.tokenize(texts)
        return self.embed_token_ids(ids)

    def embed_token_ids(self, ids):
        mask = self.text_mask_from_ids(ids, self.eos_id)
        text_embed, encodings = self._encode_text(self.params, ids)
        encodings = jnp.where(mask[..., None], encodings, 0.0)
        embed = text_embed / jnp.maximum(
            jnp.linalg.norm(text_embed, axis=-1, keepdims=True), 1e-12
        )
        return embed.astype(jnp.float32), encodings.astype(jnp.float32)

    def normalize_images(self, images):
        """[0,1] NHWC → CLIP-normalized at the CLIP input resolution."""
        from gigagan_tpu import ops

        if images.shape[-2] != self.image_size:
            # reference adapter resize: F.interpolate default
            # mode=nearest (open_clip.py:126)
            images = ops.resize_image_to(images, self.image_size, "nearest")
        mean = jnp.asarray(OPENAI_IMAGE_MEAN, images.dtype)
        std = jnp.asarray(OPENAI_IMAGE_STD, images.dtype)
        return (images - mean) / std

    def embed_images(self, images):
        images = self.normalize_images(images)
        image_embed, taps = self._encode_image(self.params, images)
        embed = image_embed / jnp.maximum(
            jnp.linalg.norm(image_embed, axis=-1, keepdims=True), 1e-12
        )
        return embed.astype(jnp.float32), taps.astype(jnp.float32)

    def contrastive_loss(self, images, texts=None, text_embeds=None):
        from gigagan_tpu.losses import clip_contrastive_loss

        assert exists(texts) ^ exists(text_embeds)
        if not exists(text_embeds):
            text_embeds, _ = self.embed_texts(texts)
        image_embeds, _ = self.embed_images(images)
        return clip_contrastive_loss(
            image_embeds, text_embeds, self.logit_scale
        )
