"""End-to-end training tests: the minimum end-to-end slice from SURVEY.md §7
(unconditional G+D, hinge + GP + aux recon + multiscale, jitted alternating
steps, EMA, checkpoint, sample grid) on an 8-virtual-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigagan_tpu import losses as L
from gigagan_tpu.data import MockImageDataset, MockTextImageDataset
from gigagan_tpu.train import GigaGAN, EMAState, ema_update, get_optimizer

IMAGE_SIZE = 16


def tiny_gan(tmp_path, **overrides):
    kwargs = dict(
        generator=dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            dim_latent=16,
            style_network=dict(dim=16, depth=1),
            self_attn_resolutions=(),
            cross_attn_resolutions=(),
            num_conv_kernels=2,
            unconditional=True,
        ),
        discriminator=dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            attn_resolutions=(),
            multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(8,),
            aux_recon_patch_dims=(1,),
            aux_recon_frac_patches=(1.0,),
            num_conv_kernels=2,
            unconditional=True,
        ),
        model_folder=str(tmp_path / "models"),
        results_folder=str(tmp_path / "results"),
        log_steps_every=1,
        save_and_sample_every=1000,
        early_save_thres_steps=0,
        num_samples=4,
        seed=0,
    )
    kwargs.update(overrides)
    return GigaGAN(**kwargs)


class TestLosses:
    def test_hinge_polarity(self):
        # D should drive real low, fake high (inverted polarity docstring,
        # reference :169)
        real_good = jnp.full((4,), -2.0)
        fake_good = jnp.full((4,), 2.0)
        assert float(L.discriminator_hinge_loss(real_good, fake_good)) == 0.0
        assert float(
            L.discriminator_hinge_loss(-real_good, -fake_good)
        ) > 0.0

    def test_matching_loss_decreases_with_rejection(self):
        # D rejecting mismatches = high logits on both → low loss
        hi = jnp.full((4,), 5.0)
        lo = jnp.full((4,), -5.0)
        assert float(L.aux_matching_loss(hi, hi)) < float(
            L.aux_matching_loss(lo, lo)
        )

    def test_gradient_penalty_value(self):
        # f(x) = a·Σx → grad = a·1 → ||g||₂ = a·sqrt(n); center 0 → w·a²·n
        x = jnp.ones((2, 5))
        gp = L.gradient_penalty(x, lambda t: 3.0 * jnp.sum(t), weight=10.0)
        np.testing.assert_allclose(float(gp), 10.0 * 9.0 * 5.0, rtol=1e-5)

    def test_contrastive_loss_prefers_alignment(self):
        key = jax.random.PRNGKey(0)
        e = jax.random.normal(key, (6, 8))
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        aligned = L.clip_contrastive_loss(e, e, 10.0)
        shuffled = L.clip_contrastive_loss(e, jnp.roll(e, 1, 0), 10.0)
        assert float(aligned) < float(shuffled)

    def test_diff_augment_identical_on_image_and_rgbs(self):
        aug = L.DiffAugment(prob=1.0, horizontal_flip=True,
                            horizontal_flip_prob=1.0)
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        rgbs = [img[:, ::2, ::2], img]
        out_img, out_rgbs = aug(jax.random.PRNGKey(1), img, rgbs)
        np.testing.assert_allclose(out_img, img[:, :, ::-1])
        np.testing.assert_allclose(out_rgbs[1], img[:, :, ::-1])

    def test_diff_augment_prob_zero_is_identity(self):
        aug = L.DiffAugment(prob=0.0, horizontal_flip=True)
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        out, _ = aug(jax.random.PRNGKey(1), img, [img])
        np.testing.assert_allclose(out, img)


class TestEMA:
    def test_warmup_copies_then_lerps(self):
        params = {"w": jnp.zeros(3)}
        ema = EMAState.create(params)
        # during warmup (step <= after+1) updates hard-copy
        ema = ema_update(ema, {"w": jnp.ones(3)}, update_every=1,
                         update_after_step=2)
        np.testing.assert_allclose(ema.params["w"], 1.0)
        for _ in range(10):
            ema = ema_update(ema, {"w": jnp.full((3,), 2.0)},
                             update_every=1, update_after_step=2)
        # past warmup: lerping toward 2 but not instantly
        assert 1.0 < float(ema.params["w"][0]) <= 2.0

    def test_flat_lerp_matches_per_leaf(self):
        """The raveled EMA lerp (homogeneous trees) must equal the
        per-leaf path (forced via a mixed-dtype tree) exactly."""
        key = jax.random.PRNGKey(3)
        mk = lambda k, s: jax.random.normal(k, s)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        homo = {"a": mk(k1, (4, 3)), "b": mk(k2, (5,))}
        # same values, but one leaf fp64-disabled... use int step buffer to
        # force the heterogeneous (per-leaf) path instead
        hetero = dict(homo, c=jnp.arange(2, dtype=jnp.int32))
        upd_homo = {"a": mk(k3, (4, 3)), "b": mk(k4, (5,))}
        upd_hetero = dict(upd_homo, c=jnp.arange(2, dtype=jnp.int32))
        e1, e2 = EMAState.create(homo), EMAState.create(hetero)
        for _ in range(6):
            e1 = ema_update(e1, upd_homo, update_every=2,
                            update_after_step=1)
            e2 = ema_update(e2, upd_hetero, update_every=2,
                            update_after_step=1)
            # the lerp must preserve leaf dtypes (ADVICE r3): the int32
            # leaf keeps the tree heterogeneous for EVERY update, so the
            # per-leaf control path stays forced at nonzero decay too
            assert e2.params["c"].dtype == jnp.int32
        for k in homo:
            np.testing.assert_allclose(e1.params[k], e2.params[k],
                                       rtol=1e-6, atol=0)

    def test_update_every_gates(self):
        params = {"w": jnp.zeros(3)}
        ema = EMAState.create(params)
        ema = ema_update(ema, {"w": jnp.ones(3)}, update_every=10,
                         update_after_step=0)
        # step 1: not a multiple of 10 and never initted → unchanged... but
        # first actual update must eventually copy
        for _ in range(9):
            ema = ema_update(ema, {"w": jnp.ones(3)}, update_every=10,
                             update_after_step=0)
        assert bool(ema.initted)


class TestOptimizer:
    def test_flat_matches_optax(self):
        """flat_adamw's single-vector update must equal optax.adamw's
        tree-mapped one leaf for leaf (and optax.adam at wd=0)."""
        import optax

        from gigagan_tpu.train.optimizer import get_optimizer

        params = {
            "w": jnp.linspace(-1.0, 1.0, 12).reshape(3, 4),
            "b": jnp.array([0.5, -0.25, 2.0]),
        }
        key = jax.random.PRNGKey(7)
        for wd in (0.0, 0.37):
            flat_tx = get_optimizer(lr=3e-3, wd=wd, betas=(0.8, 0.95),
                                    flat=True)
            ref_tx = get_optimizer(lr=3e-3, wd=wd, betas=(0.8, 0.95),
                                   flat=False)
            p_flat, p_ref = params, params
            s_flat, s_ref = flat_tx.init(p_flat), ref_tx.init(p_ref)
            for i in range(3):
                key, sub = jax.random.split(key)
                grads = jax.tree.map(
                    lambda p: jax.random.normal(sub, p.shape), params
                )
                u_flat, s_flat = flat_tx.update(grads, s_flat, p_flat)
                u_ref, s_ref = ref_tx.update(grads, s_ref, p_ref)
                p_flat = optax.apply_updates(p_flat, u_flat)
                p_ref = optax.apply_updates(p_ref, u_ref)
            for k in params:
                np.testing.assert_allclose(
                    p_flat[k], p_ref[k], rtol=2e-6, atol=2e-7,
                    err_msg=f"wd={wd} leaf={k}",
                )

    def test_flat_accepts_lr_schedule(self):
        """flat_adamw with a callable lr must match optax.adam under
        inject-style scheduling (capability parity, ADVICE r3)."""
        import optax

        from gigagan_tpu.train.optimizer import flat_adamw

        sched = optax.linear_schedule(1e-2, 1e-3, transition_steps=3)
        flat_tx = flat_adamw(sched, b1=0.8, b2=0.95)
        ref_tx = optax.adam(sched, b1=0.8, b2=0.95)
        params = {"w": jnp.linspace(-1.0, 1.0, 6).reshape(2, 3)}
        p_f, p_r = params, params
        s_f, s_r = flat_tx.init(p_f), ref_tx.init(p_r)
        key = jax.random.PRNGKey(11)
        for _ in range(4):
            key, sub = jax.random.split(key)
            grads = jax.tree.map(
                lambda p: jax.random.normal(sub, p.shape), params
            )
            u_f, s_f = flat_tx.update(grads, s_f, p_f)
            u_r, s_r = ref_tx.update(grads, s_r, p_r)
            p_f = optax.apply_updates(p_f, u_f)
            p_r = optax.apply_updates(p_r, u_r)
        np.testing.assert_allclose(p_f["w"], p_r["w"], rtol=2e-6,
                                   atol=2e-7)

    def test_optax_checkpoint_migrates_to_flat(self):
        """A serialized optax Adam(W) state (pre-flat checkpoints) must
        migrate into the flat layout with moments intact: continuing
        training from the migrated state equals continuing from the
        original optax state (ADVICE r3 medium)."""
        import optax
        from flax import serialization

        from gigagan_tpu.train.optimizer import get_optimizer
        from gigagan_tpu.train.trainer import _migrate_opt_state

        params = {
            "w": jnp.linspace(-1.0, 1.0, 12).reshape(3, 4),
            "b": jnp.array([0.5, -0.25, 2.0]),
        }
        key = jax.random.PRNGKey(5)
        for wd in (0.0, 0.37):
            kw = dict(lr=3e-3, wd=wd, betas=(0.8, 0.95))
            ref_tx = get_optimizer(flat=False, **kw)
            flat_tx = get_optimizer(flat=True, **kw)
            p_ref = params
            s_ref = ref_tx.init(p_ref)
            for _ in range(3):  # build up nonzero moments
                key, sub = jax.random.split(key)
                grads = jax.tree.map(
                    lambda p: jax.random.normal(sub, p.shape), params
                )
                u, s_ref = ref_tx.update(grads, s_ref, p_ref)
                p_ref = optax.apply_updates(p_ref, u)

            migrated_sd = _migrate_opt_state(
                serialization.to_state_dict(flat_tx.init(p_ref)),
                serialization.to_state_dict(s_ref),
                p_ref, flat_tx,
            )
            assert migrated_sd is not None, f"wd={wd}"
            s_flat = serialization.from_state_dict(
                flat_tx.init(p_ref), migrated_sd
            )
            # and the reverse direction (flat checkpoint under the optax
            # default): migrating the migrated state back must round-trip
            back_sd = _migrate_opt_state(
                serialization.to_state_dict(ref_tx.init(p_ref)),
                migrated_sd, p_ref, ref_tx,
            )
            assert back_sd is not None, f"wd={wd}"
            s_back = serialization.from_state_dict(
                ref_tx.init(p_ref), back_sd
            )
            # one more step from both states must produce identical params
            key, sub = jax.random.split(key)
            grads = jax.tree.map(
                lambda p: jax.random.normal(sub, p.shape), params
            )
            u_ref, _ = ref_tx.update(grads, s_ref, p_ref)
            u_flat, _ = flat_tx.update(grads, s_flat, p_ref)
            u_back, _ = ref_tx.update(grads, s_back, p_ref)
            for k in params:
                np.testing.assert_allclose(
                    optax.apply_updates(p_ref, u_ref)[k],
                    optax.apply_updates(p_ref, u_flat)[k],
                    rtol=2e-6, atol=2e-7, err_msg=f"wd={wd} leaf={k}",
                )
                np.testing.assert_allclose(
                    optax.apply_updates(p_ref, u_ref)[k],
                    optax.apply_updates(p_ref, u_back)[k],
                    rtol=2e-6, atol=2e-7, err_msg=f"back wd={wd} leaf={k}",
                )

    def test_adam_when_no_wd(self):
        tx = get_optimizer(lr=1e-3, wd=0.0, betas=(0.5, 0.9))
        params = {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))}
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert jnp.all(jnp.isfinite(updates["w"]))

    def test_wd_mask_excludes_small_ndim(self):
        tx = get_optimizer(lr=0.0, wd=1.0, betas=(0.5, 0.9))
        params = {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))}
        state = tx.init(params)
        zero_grads = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(zero_grads, state, params)
        # lr=0 → adam term vanishes; only decay remains, and only on w...
        # (optax folds lr into decay, so with lr=0 both are 0 — use lr>0)
        tx = get_optimizer(lr=1.0, wd=0.5, betas=(0.5, 0.9))
        state = tx.init(params)
        updates, _ = tx.update(zero_grads, state, params)
        assert float(jnp.abs(updates["w"]).sum()) > 0  # decayed
        assert float(jnp.abs(updates["b"]).sum()) == 0  # masked


@pytest.mark.slow
class TestTrainLoop:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("gan")
        gan = tiny_gan(tmp)
        ds = MockImageDataset(IMAGE_SIZE, length=64, seed=0)
        gan.set_dataloader(ds.get_dataloader(8))
        gan.forward(steps=3, grad_accum_every=2)
        return gan, tmp

    def test_steps_advanced_and_params_changed(self, trained):
        gan, _ = trained
        assert gan.steps == 4  # starts at 1, 3 steps
        metrics_finite = jax.tree.map(
            lambda x: bool(jnp.isfinite(x).all()), jax.device_get(
                gan.state.g_params
            )
        )
        assert all(jax.tree.leaves(metrics_finite))

    def test_generate(self, trained):
        gan, _ = trained
        out = gan.generate(batch_size=2, seed=7)
        assert out.shape == (2, IMAGE_SIZE, IMAGE_SIZE, 3)
        assert np.isfinite(out).all()
        # same seed → same images (EMA params fixed)
        out2 = gan.generate(batch_size=2, seed=7)
        np.testing.assert_allclose(out, out2)

    def test_save_load_roundtrip(self, trained):
        gan, tmp = trained
        ckpt = tmp / "roundtrip.ckpt"
        gan.save(ckpt)
        before = jax.device_get(gan.state.g_params)

        gan2 = tiny_gan(tmp, seed=123)
        gan2.load(ckpt)
        after = jax.device_get(gan2.state.g_params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_allclose(a, b)
        assert gan2.steps == gan.steps

    def test_sample_grid_written(self, trained):
        gan, tmp = trained
        dl = MockImageDataset(IMAGE_SIZE, length=64).get_dataloader(4)
        from gigagan_tpu.utils import cycle

        gan.save_sample(4, cycle(dl))
        # BOTH grids, reference parity (gigagan_pytorch.py:2642-2648):
        # raw-G sample-{m}.png and ema-sample-{m}.png
        samples = list((tmp / "results").glob("sample-*.png"))
        assert len(samples) >= 1
        ema_samples = list((tmp / "results").glob("ema-sample-*.png"))
        assert len(ema_samples) >= 1
        ckpts = list((tmp / "models").glob("model-*.ckpt"))
        assert len(ckpts) >= 1

    def test_checkpoint_rng_roundtrip(self, trained):
        gan, tmp = trained
        ckpt = tmp / "rng.ckpt"
        gan.save(ckpt)
        rng_at_save = np.asarray(jax.device_get(gan._rng))

        gan2 = tiny_gan(tmp, seed=999)
        assert not np.array_equal(
            np.asarray(jax.device_get(gan2._rng)), rng_at_save
        )
        gan2.load(ckpt)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(gan2._rng)), rng_at_save
        )

    def test_save_gated_to_main_process(self, trained, monkeypatch):
        """Non-main processes must not write checkpoints: state is
        replicated, and concurrent writers to shared storage would corrupt
        the file (VERDICT r3 weak #7)."""
        gan, tmp = trained
        ckpt = tmp / "nonmain.ckpt"
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        gan.save(ckpt)
        assert not ckpt.exists()
        monkeypatch.undo()
        gan.save(ckpt)
        assert ckpt.exists()

    @staticmethod
    def _adam_sd(opt_sd):
        """Locate the serialized {count, mu, nu} inside an optax chain
        state-dict (layout: {"0": ScaleByAdamState, "1": EmptyState})."""
        from gigagan_tpu.train.trainer import _find_adam

        found = _find_adam(opt_sd)
        assert found is not None, f"no adam state in {set(opt_sd)}"
        return found

    def test_load_migrates_flat_to_optax_opt_state(self, trained):
        """Loading a round-3 FLAT checkpoint ({count, m, v}) under the
        optax default must carry the Adam moments into the optax chain
        layout instead of resetting them (ADVICE r3 medium; the trainer
        implements both directions, trainer._migrate_opt_state)."""
        from flax import serialization
        from jax.flatten_util import ravel_pytree

        gan, tmp = trained
        ckpt = tmp / "flatmigrate.ckpt"
        gan.save(ckpt)
        payload = serialization.msgpack_restore(ckpt.read_bytes())
        adam = self._adam_sd(payload["state"]["g_opt"])
        params = jax.device_get(gan.state.g_params)
        mu_flat = ravel_pytree(
            serialization.from_state_dict(params, adam["mu"])
        )[0]
        nu_flat = ravel_pytree(
            serialization.from_state_dict(params, adam["nu"])
        )[0]
        # rewrite g_opt into the flat layout a round-3 checkpoint had
        payload["state"]["g_opt"] = {
            "count": adam["count"],
            "m": np.asarray(mu_flat),
            "v": np.asarray(nu_flat),
        }
        ckpt.write_bytes(serialization.msgpack_serialize(payload))

        gan2 = tiny_gan(tmp, seed=123)
        gan2.load(ckpt)
        migrated = self._adam_sd(
            serialization.to_state_dict(jax.device_get(gan2.state.g_opt))
        )
        np.testing.assert_allclose(
            np.asarray(ravel_pytree(
                serialization.from_state_dict(params, migrated["mu"])
            )[0]),
            np.asarray(mu_flat), rtol=1e-6, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ravel_pytree(
                serialization.from_state_dict(params, migrated["nu"])
            )[0]),
            np.asarray(nu_flat), rtol=1e-6, atol=0,
        )
        assert int(np.asarray(migrated["count"])) == int(
            np.asarray(adam["count"])
        )

    def test_load_migrates_optax_to_flat_opt_state(self, trained,
                                                   monkeypatch):
        """The reverse direction: an optax-layout checkpoint loaded under
        GIGAGAN_FLAT_OPT=1 lands its moments in the flat {count, m, v}
        state."""
        from flax import serialization
        from jax.flatten_util import ravel_pytree

        gan, tmp = trained
        ckpt = tmp / "optaxmigrate.ckpt"
        gan.save(ckpt)  # optax layout (the default)
        payload = serialization.msgpack_restore(ckpt.read_bytes())
        adam = self._adam_sd(payload["state"]["g_opt"])
        params = jax.device_get(gan.state.g_params)
        mu_flat = ravel_pytree(
            serialization.from_state_dict(params, adam["mu"])
        )[0]

        monkeypatch.setenv("GIGAGAN_FLAT_OPT", "1")
        gan2 = tiny_gan(tmp, seed=123)
        gan2.load(ckpt)
        migrated = jax.device_get(gan2.state.g_opt)
        assert {"count", "m", "v"} <= set(migrated)
        np.testing.assert_allclose(
            np.asarray(migrated["m"]), np.asarray(mu_flat),
            rtol=1e-6, atol=0,
        )
        assert int(np.asarray(migrated["count"])) == int(
            np.asarray(adam["count"])
        )

    def test_tolerant_load_resets_incompatible_optimizer(self, trained):
        from flax import serialization

        gan, tmp = trained
        ckpt = tmp / "optbroken.ckpt"
        gan.save(ckpt)
        # corrupt the d_opt subtree (simulates an optimizer-config change)
        payload = serialization.msgpack_restore(ckpt.read_bytes())
        payload["state"]["d_opt"] = {"bogus": np.zeros((3,), np.float32)}
        ckpt.write_bytes(serialization.msgpack_serialize(payload))

        gan2 = tiny_gan(tmp, seed=123)
        gan2.load(ckpt)  # must not crash (reference :2087-2108 behavior)
        # model weights still restored
        before = jax.device_get(gan.state.g_params)
        after = jax.device_get(gan2.state.g_params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_allclose(a, b)
        assert gan2.steps == gan.steps

    def test_tolerant_load_keeps_live_value_for_missing_leaf(self, trained):
        from flax import serialization

        gan, tmp = trained
        ckpt = tmp / "missingleaf.ckpt"
        gan.save(ckpt)
        payload = serialization.msgpack_restore(ckpt.read_bytes())
        # drop one whole g_params subtree
        dropped = sorted(payload["state"]["g_params"])[0]
        del payload["state"]["g_params"][dropped]
        ckpt.write_bytes(serialization.msgpack_serialize(payload))

        gan2 = tiny_gan(tmp, seed=123)
        live = jax.device_get(gan2.state.g_params)
        gan2.load(ckpt)
        after = jax.device_get(gan2.state.g_params)
        # dropped subtree keeps the live (gan2) values
        for a, b in zip(
            jax.tree.leaves(live[dropped]), jax.tree.leaves(after[dropped])
        ):
            np.testing.assert_allclose(a, b)
        # a restored subtree matches gan's
        other = next(k for k in sorted(after) if k != dropped)
        saved = jax.device_get(gan.state.g_params)
        for a, b in zip(
            jax.tree.leaves(saved[other]), jax.tree.leaves(after[other])
        ):
            np.testing.assert_allclose(a, b)

    def test_gp_chunk_matches_full_batch(self, tmp_path):
        vals = {}
        for chunk in (None, 2):
            gan = tiny_gan(
                tmp_path / f"c{chunk}", seed=0, gp_chunk=chunk
            )
            ds = MockImageDataset(IMAGE_SIZE, length=32, seed=0)
            dl_iter = iter(ds.get_dataloader(8))
            batch = gan._collect_batch(dl_iter, 1)
            m = gan.train_discriminator_step(
                batch, grad_accum_every=1,
                apply_gradient_penalty=True, calc_multiscale_loss=True,
            )
            vals[chunk] = float(m["gradient_penalty"])
        np.testing.assert_allclose(vals[None], vals[2], rtol=2e-4)

    def test_fused_dg_step_matches_split(self, tmp_path):
        """train_dg_step (one compiled D+G program) must produce the same
        parameters as the two separate steps — key order is identical."""
        out = {}
        for fused in (False, True):
            gan = tiny_gan(tmp_path / f"fused{fused}", seed=0)
            ds = MockImageDataset(IMAGE_SIZE, length=32, seed=0)
            batch = gan._collect_batch(iter(ds.get_dataloader(8)), 1)
            if fused:
                gan.train_dg_step(
                    batch, grad_accum_every=1,
                    apply_gradient_penalty=True,
                    calc_multiscale_loss=True,
                )
            else:
                gan.train_discriminator_step(
                    batch, grad_accum_every=1,
                    apply_gradient_penalty=True,
                    calc_multiscale_loss=True,
                )
                gan.train_generator_step(
                    batch, grad_accum_every=1, calc_multiscale_loss=True,
                )
            out[fused] = jax.device_get(
                (gan.state.d_params, gan.state.g_params)
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-7
            ),
            out[True], out[False],
        )

    def test_gp_so_flash_kernels_match_xla_step(self, tmp_path, monkeypatch):
        """The default reverse-over-reverse GP d-step with the
        differentiation-closed SO flash kernels engaged (interpret mode —
        size gates monkeypatched since CPU never auto-dispatches) must
        produce the same parameter update and penalty as the pure-XLA
        trace.  Guards the steps.py flash_so_mode wiring end to end."""
        import gigagan_tpu.ops.pallas.flash_attention as fa
        import gigagan_tpu.ops.pallas.flash_attention_so as fso

        d_cfg = dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            attn_resolutions=(8,),
            multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(8,),
            aux_recon_patch_dims=(1,),
            aux_recon_frac_patches=(1.0,),
            num_conv_kernels=2,
            unconditional=True,
        )
        engaged = {"n": 0}
        orig_so = fso.flash_attend_so

        def counting_so(*args, **kwargs):
            engaged["n"] += 1
            return orig_so(*args, **kwargs)

        out = {}
        for use_so in (True, False):
            if use_so:
                monkeypatch.setattr(fa, "flash_auto", lambda q, k: True)
                monkeypatch.setattr(fso, "flash_auto", lambda q, k: True)
                monkeypatch.setattr(fso, "flash_attend_so", counting_so)
            else:
                monkeypatch.undo()
            gan = tiny_gan(
                tmp_path / f"so{use_so}", seed=0,
                discriminator=dict(d_cfg),
            )
            ds = MockImageDataset(IMAGE_SIZE, length=32, seed=0)
            batch = gan._collect_batch(iter(ds.get_dataloader(8)), 1)
            m = gan.train_discriminator_step(
                batch, grad_accum_every=1,
                apply_gradient_penalty=True, calc_multiscale_loss=True,
            )
            out[use_so] = (
                jax.device_get(gan.state.d_params),
                float(m["gradient_penalty"]),
            )
        assert engaged["n"] > 0, "SO kernel never dispatched"
        np.testing.assert_allclose(out[True][1], out[False][1], rtol=2e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=3e-6
            ),
            out[True][0], out[False][0],
        )

    def test_gp_fwd_over_rev_matches_double_backward(self, tmp_path):
        """The forward-over-reverse R1 surrogate (∇θ 2⟨∇ₓφ, sg(∇ₓφ)⟩ via
        one jvp) must produce the same d-step parameter update as the
        torch-style reverse-over-reverse double-backward, and the same
        penalty value.  D includes self-attention so the attention
        second-order path is exercised."""
        d_cfg = dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            attn_resolutions=(8,),
            multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(8,),
            aux_recon_patch_dims=(1,),
            aux_recon_frac_patches=(1.0,),
            num_conv_kernels=2,
            unconditional=True,
        )
        out = {}
        for flag in (True, False):
            gan = tiny_gan(
                tmp_path / f"f{flag}", seed=0, gp_fwd_over_rev=flag,
                discriminator=dict(d_cfg),
            )
            ds = MockImageDataset(IMAGE_SIZE, length=32, seed=0)
            batch = gan._collect_batch(iter(ds.get_dataloader(8)), 1)
            m = gan.train_discriminator_step(
                batch, grad_accum_every=1,
                apply_gradient_penalty=True, calc_multiscale_loss=True,
            )
            out[flag] = (
                jax.device_get(gan.state.d_params),
                float(m["gradient_penalty"]),
            )
        np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=3e-6
            ),
            out[True][0], out[False][0],
        )


class TestParallel:
    def test_all_gather_batch_under_shard_map(self):
        """Explicit contrastive-pool gather for shard_map contexts, with
        gradient scatter back to the owning shard (reference
        distributed.py:20-70 equivalence)."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from gigagan_tpu import parallel

        shard_map = partial(shard_map, check_vma=False)
        mesh = parallel.make_data_mesh()
        n = jax.device_count()
        x = jnp.arange(n * 2 * 3, dtype=jnp.float32).reshape(n * 2, 3)

        def body(shard):
            pool = L.all_gather_batch(shard, "data")
            return pool

        pooled = jax.jit(shard_map(
            body, mesh=mesh, in_specs=P("data"), out_specs=P(None),
        ))(x)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(x))

        # gradient scatters back to the owning rows; each shard's loss sums
        # the GLOBAL pool, so d/dx picks up one term per device
        def loss(shard):
            pool = L.all_gather_batch(shard, "data")
            return jnp.sum(pool ** 2)[None]

        g = jax.jit(jax.grad(lambda t: jnp.sum(shard_map(
            loss, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        )(t))))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * n * np.asarray(x))

    def test_shard_batch_multiprocess_path(self, monkeypatch):
        """shard_batch's process_count>1 branch
        (make_array_from_process_local_data) produces the same global array
        as the single-process device_put path."""
        from jax.sharding import PartitionSpec as P

        from gigagan_tpu import parallel

        mesh = parallel.make_data_mesh()
        n = jax.device_count()
        batch = {"real_images": np.arange(n * 4, dtype=np.float32).reshape(
            n, 4
        )}
        single = parallel.shard_batch(batch, mesh, P("data"))
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        multi = parallel.shard_batch(batch, mesh, P("data"))
        np.testing.assert_allclose(
            np.asarray(jax.device_get(single["real_images"])),
            np.asarray(jax.device_get(multi["real_images"])),
        )


STUB_CLIP_DIM = 24


class StubClip:
    """Deterministic text embedder standing in for CLIP."""

    def embed_texts(self, texts):
        outs = []
        for t in texts:
            rng = np.random.default_rng(
                int(np.frombuffer(
                    t.encode()[:8].ljust(8, b"\0"), np.uint64
                )[0] % (2 ** 31))
            )
            enc = rng.standard_normal((7, STUB_CLIP_DIM)).astype(np.float32)
            outs.append(enc)
        return None, np.stack(outs)


def conditional_gan(tmp_path, **overrides):
    kwargs = dict(
        generator=dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            dim_latent=16,
            style_network=dict(dim=16, depth=1, dim_text_latent=16),
            text_encoder=dict(dim=16, depth=1, clip_dim=STUB_CLIP_DIM),
            self_attn_resolutions=(),
            cross_attn_resolutions=(8,),
            num_conv_kernels=2,
            unconditional=False,
        ),
        discriminator=dict(
            image_size=IMAGE_SIZE,
            dim_capacity=4,
            dim_max=32,
            attn_resolutions=(),
            multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(),
            aux_recon_patch_dims=(),
            aux_recon_frac_patches=(),
            num_conv_kernels=2,
            unconditional=False,
            text_encoder=dict(dim=16, depth=1, clip_dim=STUB_CLIP_DIM),
        ),
        generator_contrastive_loss_weight=0.0,  # StubClip has no tower
        model_folder=str(tmp_path / "models"),
        results_folder=str(tmp_path / "results"),
        log_steps_every=1000,
        clip=StubClip(),
        seed=0,
    )
    kwargs.update(overrides)
    return GigaGAN(**kwargs)


@pytest.mark.slow
class TestConditionalTraining:
    def test_text_conditioned_steps_run(self, tmp_path):
        clip_dim = STUB_CLIP_DIM

        gan = GigaGAN(
            generator=dict(
                image_size=IMAGE_SIZE,
                dim_capacity=4,
                dim_max=32,
                dim_latent=16,
                style_network=dict(dim=16, depth=1, dim_text_latent=16),
                text_encoder=dict(dim=16, depth=1, clip_dim=clip_dim),
                self_attn_resolutions=(),
                cross_attn_resolutions=(8,),
                num_conv_kernels=2,
                unconditional=False,
            ),
            discriminator=dict(
                image_size=IMAGE_SIZE,
                dim_capacity=4,
                dim_max=32,
                attn_resolutions=(),
                multiscale_input_resolutions=(8,),
                aux_recon_resolutions=(),
                aux_recon_patch_dims=(),
                aux_recon_frac_patches=(),
                num_conv_kernels=2,
                unconditional=False,
                text_encoder=dict(dim=16, depth=1, clip_dim=clip_dim),
            ),
            generator_contrastive_loss_weight=0.0,  # CLIP tower lands later
            model_folder=str(tmp_path / "models"),
            results_folder=str(tmp_path / "results"),
            log_steps_every=1000,
            clip=StubClip(),
            seed=0,
        )
        ds = MockTextImageDataset(IMAGE_SIZE, length=64)
        gan.set_dataloader(ds.get_dataloader(8))
        gan.forward(steps=2, grad_accum_every=1)
        assert gan.steps == 3

    def test_amp_gp_fwd_over_rev_with_adaptive_convs(self, tmp_path):
        """amp=True + apply_gradient_penalty + gp_fwd_over_rev with
        adaptive convs in the GP trace (conditional D Predictor heads):
        jax.jvp must flow through the bf16 fp32-out conv wrappers
        (ADVICE r4 medium — they are custom_jvp, closed under further
        differentiation)."""
        gan = conditional_gan(
            tmp_path, amp=True, gp_fwd_over_rev=True,
        )
        ds = MockTextImageDataset(IMAGE_SIZE, length=32)
        batch = gan._collect_batch(iter(ds.get_dataloader(8)), 1)
        m = gan.train_discriminator_step(
            batch, grad_accum_every=1,
            apply_gradient_penalty=True, calc_multiscale_loss=True,
        )
        assert np.isfinite(float(m["gradient_penalty"]))
        finite = jax.tree.map(
            lambda x: bool(jnp.isfinite(x.astype(jnp.float32)).all()),
            jax.device_get(gan.state.d_params),
        )
        assert all(jax.tree.leaves(finite))

    def test_clip_dim_override(self, tmp_path):
        """text_encodings of a non-default width (clip_dim=24, not CLIP's
        512) flow through G and D end to end."""
        from gigagan_tpu.models import Discriminator, Generator

        clip_dim = 24
        g = Generator(
            image_size=IMAGE_SIZE, dim_capacity=4, dim_max=32,
            dim_latent=16, style_network=dict(
                dim=16, depth=1, dim_text_latent=16
            ),
            text_encoder=dict(dim=16, depth=1, clip_dim=clip_dim),
            self_attn_resolutions=(), cross_attn_resolutions=(8,),
            num_conv_kernels=2, unconditional=False,
        )
        enc = jnp.ones((2, 7, clip_dim), jnp.float32)
        k = jax.random.PRNGKey(0)
        variables = g.init(
            {"params": k, "noise": k, "latent": k}, text_encodings=enc
        )
        out = g.apply(
            variables, text_encodings=enc,
            rngs={"noise": k, "latent": k},
        )
        assert out.shape == (2, IMAGE_SIZE, IMAGE_SIZE, 3)

        d = Discriminator(
            image_size=IMAGE_SIZE, dim_capacity=4, dim_max=32,
            attn_resolutions=(), multiscale_input_resolutions=(8,),
            aux_recon_resolutions=(), aux_recon_patch_dims=(),
            aux_recon_frac_patches=(), num_conv_kernels=2,
            unconditional=False,
            text_encoder=dict(dim=16, depth=1, clip_dim=clip_dim),
        )
        images = jnp.ones((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
        rgbs = d.real_images_to_rgbs(images)
        d_vars = d.init(
            {"params": k, "dropout": k}, images, rgbs, text_encodings=enc
        )
        logits, _, _ = d.apply(
            d_vars, images, rgbs, text_encodings=enc,
            rngs={"dropout": k},
        )
        assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
class TestAccumulationPools:
    """mb=1 degeneracy fixes: the matching-aware text roll and the CLIP
    contrastive pool must span the FULL accumulated set, like the
    reference's all_texts rotation (:2435-2436) and retain_graph pool
    (:2583-2592) — not a single microbatch."""

    def test_matching_roll_spans_accumulation(self, tmp_path):
        """At grad_accum=4, microbatch=1 — where a per-microbatch roll is
        the identity — the matching loss must be computed on pairs whose
        text comes from the PREVIOUS accumulated sample.  Verified against
        a manual re-derivation of the mismatched D pass."""
        from gigagan_tpu import losses as L

        accum = 4
        gan = conditional_gan(tmp_path)
        stub = StubClip()
        texts = ["aaaa", "bbbb", "cccc", "dddd"]
        _, enc = stub.embed_texts(texts)  # (4, 7, dim), all distinct
        rng = np.random.default_rng(0)
        imgs = rng.random((accum, 1, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(
            np.float32
        )
        batch = {
            "real_images": jnp.asarray(imgs),
            "text_encodings": jnp.asarray(enc[:, None]),
        }
        key = jax.random.PRNGKey(123)
        builder = gan.builder
        g_params = jax.device_get(gan.state.g_params)
        d_params = jax.device_get(gan.state.d_params)
        step = builder.d_step_fn(
            grad_accum_every=accum, apply_gp=False, calc_ms=False
        )
        _, metrics = step(gan.state, batch, key, gan._frozen)
        got = float(metrics["matching_aware_loss"])
        assert got != 0.0

        # manual: flatten (accum·mb) → roll ONE SAMPLE → per-microbatch
        # mismatch pass [real; fake] with the rolled text
        rolled = np.roll(enc, shift=1, axis=0)
        ms_res = gan.D.resolved_multiscale_input_resolutions
        keys = jax.random.split(key, accum)
        expected = 0.0
        for i in range(accum):
            r = jnp.asarray(imgs[i])
            t = jnp.asarray(enc[i : i + 1])
            ro = jnp.asarray(rolled[i : i + 1])
            ks = jax.random.split(keys[i], 8)
            fake, fake_rgbs = builder._generate(g_params, r, t, ks[0])
            real_rgbs = gan.D.real_images_to_rgbs(r)

            def by_res(lst):
                return {x.shape[1]: x for x in lst}

            pair_rgbs = [
                jnp.concatenate(
                    [by_res(real_rgbs)[res], by_res(fake_rgbs)[res]], axis=0
                )
                for res in ms_res
            ]
            m_images = jnp.concatenate([r, fake], axis=0)
            m_text = jnp.concatenate([ro, ro], axis=0)
            m_logits, *_ = builder._d_apply(
                d_params, m_images, pair_rgbs, m_text, ks[3],
                False, True, aux_recon_samples=1,
            )
            expected += float(
                L.aux_matching_loss(m_logits[:, :1], m_logits[:, 1:])
            )
        expected /= accum
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_matching_roll_on_gp_step_too(self, tmp_path):
        """The separate matching launch on vjp'd GP steps uses the same
        cross-accumulation roll (value must agree with the non-GP step's
        folded rows, same batch, same key)."""
        accum = 4
        gan = conditional_gan(tmp_path)
        stub = StubClip()
        _, enc = stub.embed_texts(["aaaa", "bbbb", "cccc", "dddd"])
        rng = np.random.default_rng(1)
        imgs = rng.random((accum, 1, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(
            np.float32
        )
        batch = {
            "real_images": jnp.asarray(imgs),
            "text_encodings": jnp.asarray(enc[:, None]),
        }
        key = jax.random.PRNGKey(5)
        vals = {}
        for gp in (False, True):
            step = gan.builder.d_step_fn(
                grad_accum_every=accum, apply_gp=gp, calc_ms=False
            )
            state = jax.tree.map(jnp.asarray, jax.device_get(gan.state))
            _, metrics = step(state, batch, key, gan._frozen)
            vals[gp] = float(metrics["matching_aware_loss"])
        np.testing.assert_allclose(vals[True], vals[False], rtol=1e-4)

    def test_single_sample_matching_asserts(self, tmp_path):
        """accum·mb == 1 with matching on must refuse loudly (the roll
        would be the identity → punishes correctly matched pairs)."""
        gan = conditional_gan(tmp_path)
        stub = StubClip()
        _, enc = stub.embed_texts(["aaaa"])
        batch = {
            "real_images": jnp.zeros((1, 1, IMAGE_SIZE, IMAGE_SIZE, 3)),
            "text_encodings": jnp.asarray(enc[:, None]),
        }
        step = gan.builder.d_step_fn(
            grad_accum_every=1, apply_gp=False, calc_ms=False
        )
        with pytest.raises(AssertionError, match="matching-aware"):
            step(gan.state, batch, jax.random.PRNGKey(0), gan._frozen)


@pytest.mark.slow
class TestUpsamplerTraining:
    def test_upsampler_train_and_generate(self, tmp_path):
        gan = GigaGAN(
            train_upsampler=True,
            generator=dict(
                dim=8,
                image_size=16,
                input_image_size=8,
                dim_mults=(1, 2),
                full_attn=(False, True),
                cross_attn=(False, False),
                attn_depths=(1, 1),
                temporal_attn_depths=(1, 1),
                num_conv_kernels=2,
                unconditional=True,
                style_network=dict(dim=16, depth=1),
            ),
            discriminator=dict(
                image_size=16,
                dim_capacity=4,
                dim_max=32,
                attn_resolutions=(),
                multiscale_input_resolutions=(8,),
                aux_recon_resolutions=(),
                aux_recon_patch_dims=(),
                aux_recon_frac_patches=(),
                num_conv_kernels=2,
                unconditional=True,
            ),
            model_folder=str(tmp_path / "models"),
            results_folder=str(tmp_path / "results"),
            log_steps_every=1000,
            seed=0,
        )
        ds = MockImageDataset(16, length=64, seed=0)
        gan.set_dataloader(ds.get_dataloader(8))
        gan.forward(steps=2, grad_accum_every=1)
        assert gan.steps == 3

        lowres = np.random.default_rng(0).random((2, 8, 8, 3)).astype(
            np.float32
        )
        out = gan.generate(lowres, seed=5)  # positional lowres, ref parity
        assert out.shape == (2, 16, 16, 3)

    def test_upsampler_rejects_bad_multiscale_res(self, tmp_path):
        with pytest.raises(AssertionError, match="multiscale input"):
            GigaGAN(
                train_upsampler=True,
                generator=dict(
                    dim=8, image_size=32, input_image_size=8,
                    dim_mults=(1, 2), full_attn=(False, True),
                    cross_attn=(False, False), attn_depths=(1, 1),
                    temporal_attn_depths=(1, 1),
                    unconditional=True, style_network=dict(dim=16, depth=1),
                ),
                discriminator=dict(
                    image_size=32, dim_capacity=4, dim_max=32,
                    attn_resolutions=(),
                    multiscale_input_resolutions=(4,),  # < input size
                    aux_recon_resolutions=(), aux_recon_patch_dims=(),
                    aux_recon_frac_patches=(), unconditional=True,
                ),
                model_folder=str(tmp_path / "m"),
                results_folder=str(tmp_path / "r"),
            )


@pytest.mark.slow
class TestOrbaxCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        gan = tiny_gan(tmp_path, checkpoint_backend="orbax")
        ds = MockImageDataset(IMAGE_SIZE, length=64, seed=0)
        gan.set_dataloader(ds.get_dataloader(8))
        gan.forward(steps=1, grad_accum_every=1)

        ckpt = tmp_path / "orbax-ckpt"
        gan.save(ckpt)
        before = jax.device_get(gan.state.g_params)

        gan2 = tiny_gan(tmp_path, checkpoint_backend="orbax", seed=9,
                        model_folder=str(tmp_path / "m2"))
        gan2.load(ckpt)
        after = jax.device_get(gan2.state.g_params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_allclose(a, b)
        assert gan2.steps == gan.steps
