"""Jitted alternating GAN train steps with `lax.scan` gradient accumulation.

Maps the reference's host-side training loops (gigagan_pytorch/gigagan_pytorch
.py:2226-2610) onto two compiled steps:

- `d_step`: per microbatch — sample fakes (no G grad), diff-augment, run D
  ONCE on the batched [real; fake] pair, hinge + multiscale hinge + R1
  gradient penalty (via `jax.vjp` reusing the SAME forward graph, exactly
  like torch's create_graph double-backward at :2357-2372; the fused pallas
  conv ops are differentiation-closed so GP stays on the fused kernels) +
  aux reconstruction + vision-aided hinge (+ its GP on the CLIP taps) +
  matching-aware loss, all accumulated across microbatches by `lax.scan`;
  D and VD updated by their own optimizers (reference :2477-2480).
- `g_step`: per microbatch — sample fakes WITH grad, D forward, generator
  hinge + multiscale + vision-aided + CLIP contrastive, scan-accumulated;
  optimizer update; branchless EMA update folded in.

Frozen CLIP params ride in as a separate (non-donated) `frozen` argument so
they are neither baked into the graph as constants nor touched by
optimizers.

Static variants: (apply_gradient_penalty, calc_multiscale_loss) are trace
constants — the trainer caches the ≤4 compiled step variants instead of
branching on device (a `lax.cond` over the double-backward would force both
branches to compile and pessimize memory).

Reference defects fixed here (SURVEY.md §2.3):
- #2 matching-aware loss: texts are rolled across the WHOLE accumulated
  set — the (accum·microbatch) axis — and the loss is accumulated across
  ALL microbatches (the reference groups only the last microbatch's texts
  and overwrites instead of accumulating, :2437,:2471).  A per-microbatch
  roll would be the identity at microbatch 1 (the reference's conditional
  quickstart, README.md:85-88), silently punishing D for accepting
  correctly MATCHED pairs.
- #4 weight decay plumbed for real (see train/optimizer.py).

The CLIP contrastive pool spans the FULL accumulation × all devices, like
the reference's retain_graph pool (:2583-2592), via an exact two-pass
surrogate: a forward-only scan collects every microbatch's fake image
embeds, the pooled InfoNCE loss + its embed-gradients are computed once on
the full (accum·mb) pool, and each microbatch's loss then carries the
linear surrogate ⟨e_i, sg(∂L/∂e_i)⟩ whose parameter gradient equals the
pooled loss's exact gradient (chain rule through the same deterministic
e_i(θ); RNG keys are shared between the passes).  Cost: one extra G+CLIP
forward per microbatch, no retained graphs.  A per-microbatch pool would
return identically 0 with zero gradient at microbatch 1.

Documented divergences:
- the VD gradient penalty norm is per-SAMPLE; the reference's rearrange
  treats the tap-stack layer dim as the batch (:154, fed (l b n d)).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import lax

from gigagan_tpu import losses as L
from gigagan_tpu.train.ema import EMAState, ema_update
from gigagan_tpu.utils import exists


@struct.dataclass
class GANState:
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    ema: Optional[EMAState]
    steps: jnp.ndarray  # int32 scalar
    vd_params: Any = None
    vd_buffers: Any = None
    vd_opt: Any = None


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree.map(jnp.zeros_like, t)


class TrainStepBuilder:
    """Builds the jitted d/g step variants for a (G, D[, VD]) trio."""

    def __init__(
        self,
        generator,
        discriminator,
        g_tx,
        d_tx,
        *,
        vision_aided_discriminator=None,
        vd_tx=None,
        clip=None,
        train_upsampler: bool = False,
        input_image_size: Optional[int] = None,
        multiscale_divergence_loss_weight: float = 0.1,
        discr_aux_recon_loss_weight: float = 1.0,
        vision_aided_divergence_loss_weight: float = 0.5,
        generator_contrastive_loss_weight: float = 0.1,
        matching_awareness_loss_weight: float = 0.1,
        diff_augment=None,
        ema_kwargs: Optional[dict] = None,
        remat: bool = False,
        gp_chunk: Optional[int] = None,
        gp_fwd_over_rev: bool = False,
    ):
        self.G = generator
        self.D = discriminator
        self.VD = vision_aided_discriminator
        self.vd_tx = vd_tx
        self.clip = clip
        self.g_tx = g_tx
        self.d_tx = d_tx
        self.train_upsampler = train_upsampler
        self.input_image_size = input_image_size
        self.ms_w = multiscale_divergence_loss_weight
        self.aux_w = discr_aux_recon_loss_weight
        self.vd_w = vision_aided_divergence_loss_weight
        self.contrastive_w = generator_contrastive_loss_weight
        self.matching_w = matching_awareness_loss_weight
        self.diff_augment = diff_augment
        self.remat = remat
        # R1 chunking: bound the double-backward's live graph to `gp_chunk`
        # samples by scanning the penalty over batch chunks.  D is strictly
        # per-sample (RMSNorm/SqueezeExcite pool within a sample), so
        # chunked input-gradients equal full-batch ones; flip-only
        # DiffAugment preserves gradient norms, so the penalty is computed
        # on the un-augmented pipeline.  None = single full-batch vjp.
        self.gp_chunk = gp_chunk
        # forward-over-reverse R1 (see _d_micro_loss): exact gradients via
        # grad-of-jvp with a smaller live graph (useful when the double-
        # backward exceeds HBM); measured ~15% SLOWER than the default
        # reverse-over-reverse on v5e (377 vs 330ms/iter), so it is opt-in
        self.gp_fwd_over_rev = gp_fwd_over_rev
        self.ema_kwargs = dict(ema_kwargs or {})
        self._d_cache = {}
        self._g_cache = {}
        self._dg_cache = {}

    # ---------------------------------------------------------------- utils

    @property
    def unconditional(self):
        return self.D.unconditional

    @property
    def _has_jax_clip(self):
        # a full JAX CLIP (flax model + params); duck-typed so lightweight
        # text-embedder stubs can still drive conditional training
        return exists(self.clip) and hasattr(self.clip, "model") and \
            hasattr(self.clip, "params")

    @property
    def need_vd(self):
        return exists(self.VD) and self.vd_w > 0.0 and self._has_jax_clip

    @property
    def need_contrastive(self):
        return (
            self.contrastive_w > 0.0
            and not self.unconditional
            and self._has_jax_clip
        )

    def _generate(self, g_params, real_images, text_enc, key):
        """Run G the way the trainer does (reference generate_kwargs,
        :2187-2224): noise latents; lowres conditioning when training the
        upsampler."""
        k_latent, k_noise = jax.random.split(key)
        kwargs = dict(return_all_rgbs=True)
        if not self.unconditional:
            kwargs["text_encodings"] = text_enc
        if self.train_upsampler:
            from gigagan_tpu import ops

            size = self.input_image_size
            # reference :2210 uses F.interpolate default mode (nearest)
            kwargs["lowres_image"] = ops.resize_image_to(
                real_images, size, "nearest"
            )
        else:
            kwargs["batch_size"] = real_images.shape[0]
        return self.G.apply(
            {"params": g_params},
            rngs={"latent": k_latent, "noise": k_noise},
            **kwargs,
        )

    def _d_apply(self, d_params, images, rgbs, text_enc, key,
                 return_ms, calc_aux, aux_recon_samples=None):
        kwargs = {}
        if not self.unconditional:
            kwargs["text_encodings"] = text_enc
        return self.D.apply(
            {"params": d_params},
            images,
            rgbs,
            return_multiscale_outputs=return_ms,
            calc_aux_loss=calc_aux,
            aux_recon_samples=aux_recon_samples,
            rngs={"dropout": key},
            **kwargs,
        )

    @staticmethod
    def _split_halves(logits, ms, b):
        """Split a [real; fake]-batched D output back into halves.  Main
        logits are (s, 2b) columns; multiscale maps are sample-major rows
        (batch-major group layout keeps each half contiguous)."""
        real_logits, fake_logits = logits[:, :b], logits[:, b:]
        real_ms = [m[: m.shape[0] // 2] for m in ms]
        fake_ms = [m[m.shape[0] // 2 :] for m in ms]
        return real_logits, real_ms, fake_logits, fake_ms

    def _clip_taps(self, clip_params, images):
        """CLIP visual tap stack for images in [0,1] (grad flows through)."""
        from gigagan_tpu.models.clip import CLIPModel

        imgs = self.clip.normalize_images(images.astype(jnp.float32))
        _, taps = self.clip.model.apply(
            {"params": clip_params}, imgs, method=CLIPModel.encode_image
        )
        return taps

    def _clip_image_embed(self, clip_params, images):
        from gigagan_tpu.models.clip import CLIPModel

        imgs = self.clip.normalize_images(images.astype(jnp.float32))
        embed, _ = self.clip.model.apply(
            {"params": clip_params}, imgs, method=CLIPModel.encode_image
        )
        embed = embed.astype(jnp.float32)
        return embed / jnp.maximum(
            jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12
        )

    def _vd_apply(self, vd_params, vd_buffers, taps, text_embeds):
        kwargs = {}
        if not self.VD.unconditional:
            kwargs["text_embeds"] = text_embeds
        return self.VD.apply(
            {"params": vd_params, "buffers": vd_buffers}, taps, **kwargs
        )

    # --------------------------------------------------------------- d step

    def _d_micro_loss(self, trainable, g_params, vd_buffers, frozen,
                      real_images, text_enc, text_embeds, rolled_text, key,
                      *, apply_gp, calc_ms):
        ks = jax.random.split(key, 8)
        compute_dtype = self.D.dtype
        d_params = trainable["d"]

        # fakes, no G grad (reference: :2294-2316)
        fake, fake_rgbs = self._generate(g_params, real_images, text_enc,
                                         ks[0])
        fake = lax.stop_gradient(fake)
        fake_rgbs = [lax.stop_gradient(r) for r in fake_rgbs]

        # diff augment (identically across image + rgbs)
        if exists(self.diff_augment):
            fake_aug, fake_rgbs_aug = self.diff_augment(ks[1], fake,
                                                        fake_rgbs)
        else:
            fake_aug, fake_rgbs_aug = fake, fake_rgbs

        def real_pipeline(imgs):
            rgbs = self.D.real_images_to_rgbs(imgs)
            if exists(self.diff_augment):
                return self.diff_augment(ks[2], imgs, rgbs)
            return imgs, rgbs

        real_images = real_images.astype(compute_dtype)
        b = real_images.shape[0]

        # ONE batched D call for [real; fake]: halves the per-step launch
        # count (the 256px step is op-overhead/bandwidth-bound, not
        # MXU-bound); batch-major group layout keeps halves contiguous.
        # One vjp gives the input-gradient closure for BOTH R1 penalties —
        # the JAX equivalent of create_graph=True (reference :2357-2372).
        ms_res = self.D.resolved_multiscale_input_resolutions

        def pair_up(real_rgbs, fake_rgbs_list, *extra_rgb_lists):
            # reals carry exactly the multiscale resolutions; the generator
            # pyramid has extras — pair per resolution
            indexed = [
                {t.shape[1]: t for t in lst}
                for lst in (real_rgbs, fake_rgbs_list, *extra_rgb_lists)
            ]
            return [
                jnp.concatenate([ix[r] for ix in indexed], axis=0)
                for r in ms_res
            ]

        # matching-aware rows ride IN the same batched D call (mismatched
        # (image, rolled-text) pairs, reference :2432-2475 with defect #2
        # fixed): one 4b-batch apply instead of a third full D launch.
        # Excluded from the vjp'd GP call — zero-cotangent rows would still
        # pay backward FLOPs through the whole trunk.  `rolled_text` is the
        # step-level roll across the FULL (accum·mb) axis (see module
        # docstring) so mismatches are real at any microbatch size.
        want_matching = (
            not self.unconditional and self.matching_w > 0.0
        )
        fold_matching = want_matching and not (
            apply_gp and self.gp_chunk is None
        )
        rolled = rolled_text if want_matching else None

        def d_on_pair(real_imgs, fake_imgs, params=None):
            params = d_params if params is None else params
            aug, rgbs = real_pipeline(real_imgs)
            if fold_matching:
                real_rgbs_plain = self.D.real_images_to_rgbs(real_imgs)
                images = jnp.concatenate(
                    (aug, fake_imgs, real_imgs, fake), axis=0
                )
                pair_rgbs = pair_up(
                    rgbs, fake_rgbs_aug, real_rgbs_plain, fake_rgbs
                )
                text = jnp.concatenate(
                    (text_enc, text_enc, rolled, rolled), axis=0
                )
            else:
                images = jnp.concatenate((aug, fake_imgs), axis=0)
                pair_rgbs = pair_up(rgbs, fake_rgbs_aug)
                text = (
                    jnp.concatenate((text_enc, text_enc), axis=0)
                    if not self.unconditional else None
                )
            return self._d_apply(params, images, pair_rgbs, text, ks[3],
                                 calc_ms, True, aux_recon_samples=b)

        gp_loss = jnp.asarray(0.0)
        if apply_gp and self.gp_chunk is None and not self.gp_fwd_over_rev:
            # reverse-over-reverse default: the SAME batched [real; fake]
            # call via one vjp.  The joint vjp yields both input gradients
            # at once (real logits have no fake dependence and vice versa,
            # so the cross terms are structurally zero).  Attention runs on
            # the differentiation-closed fused-heads kernels
            # (ops/pallas/flash_attention_so): the trace's attend_fused
            # calls lower to flash_attend_so, whose backward is itself a
            # custom-vjp Pallas op with a second-order adjoint kernel — so
            # the R1 double-backward keeps the (n, n) maps in VMEM instead
            # of XLA's materialized fp32 double-backward.  Ineligible
            # attention shapes fall back to XLA inside the same context.
            from gigagan_tpu.ops.pallas.flash_attention_so import (
                flash_so_mode,
            )

            # has_aux: the aux-recon losses stay OUT of the vjp's cotangent
            # space, so the R1 input-gradient backward (and its double-
            # backward) never traverses the SimpleDecoder branch — exactly
            # the graph torch's autograd.grad(outputs=[logits, *ms])
            # differentiates (reference :2357-2372).  aux_losses remain
            # ordinary traced values, so their PARAMETER gradients still
            # flow through the outer value_and_grad.
            def d_on_pair_main(r, f):
                lg, msl, aux = d_on_pair(r, f)
                return (lg, msl), aux

            with flash_so_mode():
                (logits, ms), pair_vjp, aux_losses = jax.vjp(
                    d_on_pair_main, real_images, fake_aug, has_aux=True
                )
        else:
            # common path: ONE batched D call for [real; fake] halves the
            # per-step launch count.  Direct call (no vjp): an unused vjp
            # closure would bloat the outer grad graph.
            logits, ms, aux_losses = d_on_pair(real_images, fake_aug)

        matching = jnp.asarray(0.0)
        if fold_matching:
            # split off the matching columns before the hinge halves
            m_logits = logits[:, 2 * b :]
            logits = logits[:, : 2 * b]
            ms = [m[: 2 * (m.shape[0] // 4)] for m in ms]
            matching = L.aux_matching_loss(
                m_logits[:, :b], m_logits[:, b:]
            )
        real_logits, real_ms, fake_logits, fake_ms = (
            self._split_halves(logits, ms, b)
        )

        divergence = L.discriminator_hinge_loss(real_logits, fake_logits)
        total = divergence

        ms_div = jnp.asarray(0.0)
        if self.ms_w > 0.0 and calc_ms and len(fake_ms) > 0:
            for mf, mr in zip(fake_ms, real_ms):
                ms_div = ms_div + L.discriminator_hinge_loss(mr, mf)
            total = total + ms_div * self.ms_w

        if apply_gp:

            def sample_sq_norms(grads):
                g = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
                return jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-12) ** 2

            if self.gp_chunk is None and self.gp_fwd_over_rev:
                # Forward-over-reverse R1.  Reverse-over-reverse (torch's
                # create_graph, reference :2357-2372) forces the whole D
                # backward onto second-order-capable paths — the flash
                # kernels are first-order, and XLA's attention
                # double-backward materializes (n, n) fp32 maps in HBM
                # (~150ms/iter of the 330ms GP step on v5e).  Instead:
                #   g      = ∇ₓ⟨D(x), u⟩      (one vjp at FROZEN params —
                #            stop_gradient(θ) — so the fused kernels'VJP
                #            is never linearized and flash stays ON; XLA
                #            CSEs the duplicated forward)
                #   GP     = 10·mean‖g‖²       (numeric value only)
                #   ∇θ GP  = 2·10/b·∇θ ⟨∇ₓφ, g⟩ = ∇θ (20/b·jvp(φ; g))
                # — EXACT: d/dθ‖g(θ)‖² = 2 gᵀ dg/dθ = d/dθ 2⟨g(θ), v⟩ at
                # v = sg(g), and ⟨∇ₓφ, v⟩ is a directional derivative,
                # i.e. one forward-mode pass (the classic hvp recipe,
                # grad∘jvp).  The surrogate's jvp trace runs the
                # first-order-only custom-VJP ops on their XLA fallbacks
                # (they forbid jvp); everything else is spent as ~2
                # forwards + ~2 backwards instead of the O(10x)
                # double-backward.  Weighted cotangents reproduce the
                # reference's grad_outputs ([1, ms_w, ...]; aux excluded).
                frozen_d = lax.stop_gradient(d_params)

                def d_on_pair_frozen(r, f):
                    lg, msl, aux = d_on_pair(r, f, params=frozen_d)
                    return (lg, msl), aux

                # has_aux: keep the aux-recon branch out of the R1
                # backward (see the reverse-over-reverse path above)
                _, sg_vjp, _ = jax.vjp(
                    d_on_pair_frozen, real_images, fake_aug, has_aux=True
                )
                cot_logits = jnp.ones_like(logits)
                cot_ms = [jnp.ones_like(m) * self.ms_w for m in ms]
                v_real, v_fake = sg_vjp((cot_logits, cot_ms))
                gp_value = 10.0 * (
                    jnp.mean(sample_sq_norms(v_real))
                    + jnp.mean(sample_sq_norms(v_fake))
                )

                from gigagan_tpu.ops.adaptive_conv import (
                    pallas_disabled,
                )
                from gigagan_tpu.ops.pallas.flash_attention_hv import (
                    flash_hv_mode,
                )

                def phi(r, f):
                    # ⟨D_pipeline(r, f), u⟩ — the same traced pipeline
                    # the vjp above differentiated, with the cotangent
                    # weights folded into a scalar.  Attention runs on
                    # the grad-of-jvp-capable flash kernels
                    # (flash_attention_hv); the fused convs stay XLA
                    # (their custom VJP forbids jvp).
                    with flash_hv_mode(), pallas_disabled():
                        lg, msl, _ = d_on_pair(r, f)
                    out = jnp.sum(lg.astype(jnp.float32))
                    for m in msl:
                        out = out + self.ms_w * jnp.sum(
                            m.astype(jnp.float32)
                        )
                    return out

                _, s = jax.jvp(
                    phi, (real_images, fake_aug),
                    (v_real.astype(real_images.dtype),
                     v_fake.astype(fake_aug.dtype)),
                )
                surrogate = (20.0 / b) * s
                # value = gp_value, gradient = ∇θ surrogate
                gp_loss = (
                    gp_value + surrogate - lax.stop_gradient(surrogate)
                )
            elif self.gp_chunk is None:
                # reverse-over-reverse (torch create_graph equivalent);
                # aux is outside the cotangent space (has_aux above)
                cot_logits = jnp.ones_like(logits)
                cot_ms = [jnp.ones_like(m) * self.ms_w for m in ms]
                g_real, g_fake = pair_vjp((cot_logits, cot_ms))
                gp_loss = 10.0 * (
                    jnp.mean(sample_sq_norms(g_real))
                    + jnp.mean(sample_sq_norms(g_fake))
                )
            else:
                # chunked R1: re-derive the penalty in a scan over batch
                # chunks so the live double-backward graph is chunk-sized.
                # Exact per-sample equality with the full-batch penalty —
                # see the gp_chunk comment in __init__.
                c = min(self.gp_chunk, b)
                assert b % c == 0, (
                    f"gp_chunk {c} must divide microbatch {b}"
                )
                nch = b // c

                def chunked(t):
                    return t.reshape(nch, c, *t.shape[1:])

                scan_in = (
                    chunked(real_images),
                    chunked(fake),
                    [chunked(r) for r in fake_rgbs],
                    (chunked(text_enc) if not self.unconditional
                     else jnp.zeros((nch, c, 0))),
                )

                def gp_body(acc, inp):
                    r_chunk, f_chunk, frgbs_chunk, t_chunk = inp

                    def d_chunk(r_imgs, f_imgs):
                        rgbs_r = self.D.real_images_to_rgbs(r_imgs)
                        images = jnp.concatenate((r_imgs, f_imgs), axis=0)
                        prgbs = pair_up(rgbs_r, frgbs_chunk)
                        text = (
                            jnp.concatenate((t_chunk, t_chunk), axis=0)
                            if not self.unconditional else None
                        )
                        lg, msl, _ = self._d_apply(
                            d_params, images, prgbs, text, ks[4],
                            calc_ms, False,
                        )
                        return lg, msl

                    from gigagan_tpu.ops.pallas.flash_attention_so import (
                        flash_so_mode,
                    )

                    with flash_so_mode():  # second-order flash kernels
                        (lg, msl), vjp_fn = jax.vjp(
                            d_chunk, r_chunk, f_chunk
                        )
                    cot = (
                        jnp.ones_like(lg),
                        [jnp.ones_like(m) * self.ms_w for m in msl],
                    )
                    g_r, g_f = vjp_fn(cot)
                    acc = acc + jnp.sum(sample_sq_norms(g_r)) \
                        + jnp.sum(sample_sq_norms(g_f))
                    return acc, None

                # remat the body: without it the scan SAVES each chunk's
                # vjp residuals for the outer backward — the whole point of
                # chunking (bounding the live double-backward graph to one
                # chunk) is lost and HBM use exceeds the unchunked vjp
                # (measured 47.9G vs 30.9G at microbatch 16 on v5e).  With
                # remat each chunk's inner D graph is rebuilt during the
                # outer backward, sequentially.
                total_sq, _ = lax.scan(
                    jax.checkpoint(gp_body), jnp.asarray(0.0), scan_in
                )
                gp_loss = 10.0 * total_sq / b

        aux_loss = jnp.asarray(0.0)
        if self.aux_w > 0.0 and len(aux_losses) > 0:
            aux_loss = sum(aux_losses)
            total = total + aux_loss * self.aux_w

        # vision-aided discriminator: hinge on frozen-CLIP feature taps
        # (reference: :2381-2405), GP w.r.t. the taps themselves
        vd_div = jnp.asarray(0.0)
        if self.need_vd:
            vd_params = trainable["vd"]
            clip_params = frozen["clip"]

            def vd_on_taps(taps):
                return self._vd_apply(vd_params, vd_buffers, taps,
                                      text_embeds)

            real_taps = self._clip_taps(clip_params, real_images)
            (real_vd_logits, vd_vjp) = jax.vjp(vd_on_taps, real_taps)
            fake_vd_logits = vd_on_taps(
                self._clip_taps(clip_params, fake_aug)
            )
            for fr, fk in zip(real_vd_logits, fake_vd_logits):
                vd_div = vd_div + L.discriminator_hinge_loss(fr, fk)
            total = total + vd_div * self.vd_w

            if apply_gp:
                cot = [jnp.ones_like(t) * self.vd_w for t in real_vd_logits]
                (tap_grads,) = vd_vjp(cot)
                # per-sample norm (taps are (L, b, n, d))
                g = jnp.moveaxis(tap_grads, 1, 0)
                g = g.reshape(g.shape[0], -1).astype(jnp.float32)
                norm = jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-12)
                gp_loss = gp_loss + 10.0 * jnp.mean(norm ** 2)

        if apply_gp:
            total = total + gp_loss

        # matching-aware loss: mismatched (image, text) pairs via roll
        # (fixes reference defect §2.3 #2 — accumulated per microbatch).
        # Non-GP steps fold these rows into the main batched D call above;
        # vjp'd GP steps keep the separate launch so the R1 backward does
        # not traverse zero-cotangent matching rows.
        if want_matching and not fold_matching:
            real_rgbs_plain = self.D.real_images_to_rgbs(real_images)
            m_images = jnp.concatenate((real_images, fake), axis=0)
            m_rgbs = pair_up(real_rgbs_plain, fake_rgbs)
            m_text = jnp.concatenate((rolled, rolled), axis=0)
            m_logits, *_ = self._d_apply(
                d_params, m_images, m_rgbs, m_text, ks[6], False, False
            )
            matching = L.aux_matching_loss(
                m_logits[:, :b], m_logits[:, b:]
            )
        if want_matching:
            total = total + matching * self.matching_w

        metrics = dict(
            divergence=divergence,
            multiscale_divergence=ms_div,
            vision_aided_divergence=vd_div,
            matching_aware_loss=matching,
            gradient_penalty=gp_loss,
            aux_reconstruction=aux_loss,
        )
        return total, metrics

    def d_step_fn(self, *, grad_accum_every: int, apply_gp: bool,
                  calc_ms: bool):
        """Returns jitted d_step(state, batch, key, frozen) for this static
        config."""
        cache_key = (grad_accum_every, apply_gp, calc_ms)
        if cache_key in self._d_cache:
            return self._d_cache[cache_key]
        step = self._d_step_raw(
            grad_accum_every=grad_accum_every, apply_gp=apply_gp,
            calc_ms=calc_ms,
        )
        jitted = jax.jit(step, donate_argnums=(0,))
        self._d_cache[cache_key] = jitted
        return jitted

    def _d_step_raw(self, *, grad_accum_every: int, apply_gp: bool,
                    calc_ms: bool):
        def step(state: GANState, batch, key, frozen):
            # batch arrays are (grad_accum, microbatch, ...): the microbatch
            # axis carries the data sharding; scan walks the accum axis
            real = batch["real_images"]
            text = batch.get("text_encodings")
            embeds = batch.get("text_embeds")
            accum = grad_accum_every
            assert real.shape[0] == accum, (
                f"batch leading dim {real.shape[0]} != grad_accum {accum}"
            )
            mb = real.shape[1]
            text_stack = (
                text if exists(text) else jnp.zeros((accum, mb, 0))
            )
            embed_stack = (
                embeds if exists(embeds) else jnp.zeros((accum, mb, 0))
            )
            keys = jax.random.split(key, accum)

            # matching-aware roll spans the FULL accumulated set (reference
            # rotates all_texts, :2435-2436): flatten (accum, mb) → roll one
            # SAMPLE → restack, so each microbatch's mismatched text comes
            # from its flat predecessor — real mismatches at any mb.
            want_matching = not self.unconditional and self.matching_w > 0.0
            if want_matching:
                assert accum * mb >= 2, (
                    "matching-aware loss needs a total accumulated batch of "
                    f"≥2 samples (got grad_accum={accum} × microbatch={mb}); "
                    "a 1-sample roll is the identity and would punish D for "
                    "accepting correctly matched pairs"
                )
                flat = text_stack.reshape(
                    (accum * mb,) + text_stack.shape[2:]
                )
                rolled_stack = jnp.roll(flat, shift=1, axis=0).reshape(
                    text_stack.shape
                )
            else:
                rolled_stack = text_stack

            trainable = {"d": state.d_params}
            if self.need_vd:
                trainable["vd"] = state.vd_params

            loss_fn = functools.partial(
                self._d_micro_loss, apply_gp=apply_gp, calc_ms=calc_ms
            )
            if self.remat:
                # recompute the microbatch forward during backward: HBM is
                # the binding constraint (trade ~33% step FLOPs for 3-4x
                # batch headroom)
                loss_fn = jax.checkpoint(loss_fn)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, inp):
                grads_acc, metrics_acc = carry
                r, t, e, rolled, k = inp
                t = t if not self.unconditional else None
                e = e if self.need_vd or self.need_contrastive else None
                rolled = rolled if want_matching else None
                (_, metrics), grads = grad_fn(
                    trainable, state.g_params, state.vd_buffers,
                    frozen, r, t, e, rolled, k,
                )
                metrics = jax.tree.map(
                    lambda a, m: a + m / accum, metrics_acc, metrics
                )
                return (_tree_add(grads_acc, grads), metrics), None

            if accum == 1:
                # grad-accum 1 (the quickstart/bench path): call the
                # micro-loss directly — a length-1 lax.scan still pays
                # stack/slice/copy traffic on every carry leaf (~300-leaf
                # grad trees; part of the ~10 ms/iter copy bucket in the
                # round-5 device trace), and the zero-init + add of the
                # grads carry is a full extra pass over both param trees
                (_, metrics), grads = grad_fn(
                    trainable, state.g_params, state.vd_buffers, frozen,
                    real[0],
                    text_stack[0] if not self.unconditional else None,
                    embed_stack[0]
                    if self.need_vd or self.need_contrastive else None,
                    rolled_stack[0] if want_matching else None,
                    keys[0],
                )
            else:
                zero_metrics = dict(
                    divergence=0.0, multiscale_divergence=0.0,
                    vision_aided_divergence=0.0, matching_aware_loss=0.0,
                    gradient_penalty=0.0, aux_reconstruction=0.0,
                )
                zero_metrics = jax.tree.map(jnp.asarray, zero_metrics)
                (grads, metrics), _ = lax.scan(
                    body,
                    (_tree_zeros_like(trainable), zero_metrics),
                    (real, text_stack, embed_stack, rolled_stack, keys),
                )
                grads = jax.tree.map(lambda g: g / accum, grads)

            updates, d_opt = self.d_tx.update(
                grads["d"], state.d_opt, state.d_params
            )
            d_params = optax.apply_updates(state.d_params, updates)
            new_state = state.replace(d_params=d_params, d_opt=d_opt)

            if self.need_vd:
                vd_updates, vd_opt = self.vd_tx.update(
                    grads["vd"], state.vd_opt, state.vd_params
                )
                vd_params = optax.apply_updates(state.vd_params, vd_updates)
                new_state = new_state.replace(
                    vd_params=vd_params, vd_opt=vd_opt
                )

            return new_state, metrics

        return step

    # --------------------------------------------------------------- g step

    def _g_fake_embed(self, g_params, frozen, real_images, text_enc, key):
        """CLIP image embed of the fakes this microbatch WILL generate in
        `_g_micro_loss` — identical key split (ks[0] latent/noise, ks[1]
        augment) so the two passes produce bit-identical fakes.  Used by
        the forward-only pre-pass that builds the cross-accumulation
        contrastive pool (module docstring)."""
        ks = jax.random.split(key, 4)
        fake, rgbs = self._generate(g_params, real_images, text_enc, ks[0])
        if exists(self.diff_augment):
            fake, _ = self.diff_augment(ks[1], fake, rgbs)
        return self._clip_image_embed(frozen["clip"], fake)

    def _g_micro_loss(self, g_params, d_params, vd_params, vd_buffers,
                      frozen, real_images, text_enc, text_embeds, key,
                      pool_grad=None, pool_value=None,
                      *, calc_ms, pool_scale=1.0):
        ks = jax.random.split(key, 4)

        fake, rgbs = self._generate(g_params, real_images, text_enc, ks[0])
        if exists(self.diff_augment):
            fake_aug, rgbs_aug = self.diff_augment(ks[1], fake, rgbs)
        else:
            fake_aug, rgbs_aug = fake, rgbs

        logits, ms_logits, _ = self._d_apply(
            d_params, fake_aug, rgbs_aug, text_enc, ks[2], calc_ms, False
        )

        divergence = L.generator_hinge_loss(logits)
        total = divergence

        ms_div = jnp.asarray(0.0)
        if self.ms_w > 0.0 and calc_ms and len(ms_logits) > 0:
            for m in ms_logits:
                ms_div = ms_div + L.generator_hinge_loss(m)
            total = total + ms_div * self.ms_w

        vd_div = jnp.asarray(0.0)
        if self.need_vd:
            taps = self._clip_taps(frozen["clip"], fake_aug)
            vd_logits = self._vd_apply(vd_params, vd_buffers, taps,
                                       text_embeds)
            for logit in vd_logits:
                vd_div = vd_div + L.generator_hinge_loss(logit)
            total = total + vd_div * self.vd_w

        contrastive = jnp.asarray(0.0)
        if self.need_contrastive:
            image_embeds = self._clip_image_embed(frozen["clip"], fake_aug)
            if exists(pool_grad):
                # cross-accumulation pool: loss VALUE comes from the step-
                # level pooled InfoNCE; this microbatch's GRADIENT is the
                # exact chain-rule term ⟨∂L/∂e_i, ∂e_i/∂θ⟩ via a linear
                # surrogate (pool_scale undoes the scan's 1/accum)
                sur = pool_scale * jnp.sum(
                    image_embeds.astype(jnp.float32) * pool_grad
                )
                contrastive = pool_value + sur - lax.stop_gradient(sur)
            else:
                logit_scale = jnp.exp(frozen["clip"]["logit_scale"])
                contrastive = L.clip_contrastive_loss(
                    image_embeds, text_embeds, logit_scale
                )
            total = total + contrastive * self.contrastive_w

        metrics = dict(
            divergence=divergence,
            multiscale_divergence=ms_div,
            total_vd_divergence=vd_div,
            contrastive_loss=contrastive,
        )
        return total, metrics

    def g_step_fn(self, *, grad_accum_every: int, calc_ms: bool):
        cache_key = (grad_accum_every, calc_ms)
        if cache_key in self._g_cache:
            return self._g_cache[cache_key]
        step = self._g_step_raw(
            grad_accum_every=grad_accum_every, calc_ms=calc_ms
        )
        jitted = jax.jit(step, donate_argnums=(0,))
        self._g_cache[cache_key] = jitted
        return jitted

    def _g_step_raw(self, *, grad_accum_every: int, calc_ms: bool):
        def step(state: GANState, batch, key, frozen):
            real = batch["real_images"]
            text = batch.get("text_encodings")
            embeds = batch.get("text_embeds")
            accum = grad_accum_every
            assert real.shape[0] == accum
            mb = real.shape[1]
            text_stack = (
                text if exists(text) else jnp.zeros((accum, mb, 0))
            )
            embed_stack = (
                embeds if exists(embeds) else jnp.zeros((accum, mb, 0))
            )
            keys = jax.random.split(key, accum)

            # cross-accumulation contrastive pool (module docstring): a
            # forward-only scan collects every microbatch's fake embeds at
            # frozen params, the pooled InfoNCE + its embed gradients are
            # computed once, and the main scan consumes the per-microbatch
            # gradient slices through the exact linear surrogate.
            pool_accum = self.need_contrastive and accum > 1
            if self.need_contrastive:
                assert accum * mb >= 2, (
                    "CLIP contrastive loss needs a total accumulated batch "
                    f"of ≥2 samples (got grad_accum={accum} × microbatch="
                    f"{mb}); a 1-pair pool is identically 0 with zero "
                    "gradient"
                )
            if pool_accum:
                g_frozen = lax.stop_gradient(state.g_params)

                def embed_body(carry, inp):
                    r, t, k = inp
                    e = self._g_fake_embed(g_frozen, frozen, r, t, k)
                    return carry, e

                _, pool_embeds = lax.scan(
                    embed_body, 0.0, (real, text_stack, keys)
                )
                e_flat = pool_embeds.reshape(accum * mb, -1)
                t_flat = embed_stack.reshape(accum * mb, -1).astype(
                    jnp.float32
                )
                logit_scale = jnp.exp(frozen["clip"]["logit_scale"])
                pool_value, pool_grad_flat = jax.value_and_grad(
                    lambda e: L.clip_contrastive_loss(
                        e, t_flat, logit_scale
                    )
                )(e_flat)
                pool_grads = lax.stop_gradient(pool_grad_flat).reshape(
                    accum, mb, -1
                )
                pool_values = jnp.broadcast_to(
                    lax.stop_gradient(pool_value), (accum,)
                )

            loss_fn = functools.partial(
                self._g_micro_loss, calc_ms=calc_ms,
                pool_scale=float(accum),
            )
            if self.remat:
                loss_fn = jax.checkpoint(loss_fn)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, inp):
                grads_acc, metrics_acc = carry
                if pool_accum:
                    r, t, e, k, pg, pv = inp
                else:
                    r, t, e, k = inp
                    pg = pv = None
                t = t if not self.unconditional else None
                e = e if self.need_vd or self.need_contrastive else None
                (_, metrics), grads = grad_fn(
                    state.g_params, state.d_params, state.vd_params,
                    state.vd_buffers, frozen, r, t, e, k, pg, pv,
                )
                metrics = jax.tree.map(
                    lambda a, m: a + m / accum, metrics_acc, metrics
                )
                return (_tree_add(grads_acc, grads), metrics), None

            if accum == 1:
                # grad-accum 1: bypass the length-1 scan (see the d step);
                # pool_accum is structurally False here, so the micro-loss
                # computes the full contrastive pool inline when needed
                (_, metrics), grads = grad_fn(
                    state.g_params, state.d_params, state.vd_params,
                    state.vd_buffers, frozen,
                    real[0],
                    text_stack[0] if not self.unconditional else None,
                    embed_stack[0]
                    if self.need_vd or self.need_contrastive else None,
                    keys[0], None, None,
                )
            else:
                zero_metrics = dict(
                    divergence=0.0, multiscale_divergence=0.0,
                    total_vd_divergence=0.0, contrastive_loss=0.0,
                )
                zero_metrics = jax.tree.map(jnp.asarray, zero_metrics)
                xs = (real, text_stack, embed_stack, keys)
                if pool_accum:
                    xs = xs + (pool_grads, pool_values)
                (grads, metrics), _ = lax.scan(
                    body,
                    (_tree_zeros_like(state.g_params), zero_metrics),
                    xs,
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
            updates, g_opt = self.g_tx.update(
                grads, state.g_opt, state.g_params
            )
            g_params = optax.apply_updates(state.g_params, updates)

            ema = state.ema
            if exists(ema):
                ema = ema_update(ema, g_params, **self.ema_kwargs)

            new_state = state.replace(
                g_params=g_params, g_opt=g_opt, ema=ema,
                steps=state.steps + 1,
            )
            return new_state, metrics

        return step

    # ---------------------------------------------------- fused d+g step

    def dg_step_fn(self, *, grad_accum_every: int, apply_gp: bool,
                   calc_ms: bool):
        """ONE compiled program running the D step then the G step on the
        same batch — the trainer's unconditional fast path (reference loop
        order, gigagan_pytorch.py:2226-2610).  Halves per-iteration program
        launches (each costs ~0.5ms dispatch on the v5e relay) and lets
        XLA schedule across the step boundary."""
        cache_key = (grad_accum_every, apply_gp, calc_ms)
        if cache_key in self._dg_cache:
            return self._dg_cache[cache_key]
        d_raw = self._d_step_raw(
            grad_accum_every=grad_accum_every, apply_gp=apply_gp,
            calc_ms=calc_ms,
        )
        g_raw = self._g_step_raw(
            grad_accum_every=grad_accum_every, calc_ms=calc_ms
        )

        def step(state: GANState, batch, d_key, g_key, frozen):
            state, d_metrics = d_raw(state, batch, d_key, frozen)
            state, g_metrics = g_raw(state, batch, g_key, frozen)
            return state, d_metrics, g_metrics

        jitted = jax.jit(step, donate_argnums=(0,))
        self._dg_cache[cache_key] = jitted
        return jitted
