"""On-device augmentation (ops/augment.py): geometry oracles + train-step wiring.

The host-side PIL path is covered in test_data.py; these tests pin the
device warp's semantics (identity, integer translation vs np.roll, fill,
determinism) and that ``data.augment_device`` reaches the jitted train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.data.synthetic import synthetic_batch
from img2latex_tpu.models.seq2seq import build_model
from img2latex_tpu.ops.augment import augment_batch, warp_affine
from img2latex_tpu.training.optim import build_optimizer
from img2latex_tpu.training.steps import create_train_state, make_train_step


def tiny_cfg():
    cfg = Config()
    cfg.model.embedding_dim = 32
    cfg.model.decoder.hidden_dim = 32
    cfg.model.decoder.lstm_layers = 1
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 16
    cfg.model.encoder.cnn.img_width = 32
    cfg.model.encoder.cnn.conv_filters = [4]
    cfg.data.max_seq_length = 10
    cfg.training.accumulation_steps = 1
    cfg.hardware.compute_dtype = "float32"
    return cfg


class TestWarpAffine:
    def test_identity(self, rng):
        img = rng.integers(0, 256, (8, 12, 1)).astype(np.uint8)
        out = warp_affine(
            jnp.asarray(img), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0), fill=255.0,
        )
        np.testing.assert_allclose(np.asarray(out), img.astype(np.float32), atol=1e-4)

    def test_integer_translation_matches_roll(self, rng):
        img = rng.integers(0, 256, (8, 12, 1)).astype(np.float32)
        tx, ty = 3.0, 2.0  # shift content right 3, down 2
        out = np.asarray(
            warp_affine(
                jnp.asarray(img), jnp.float32(0.0), jnp.float32(tx),
                jnp.float32(ty), fill=99.0,
            )
        )
        expect = np.full_like(img, 99.0)
        expect[2:, 3:, :] = img[:-2, :-3, :]
        np.testing.assert_allclose(out, expect, atol=1e-3)

    def test_fill_outside(self):
        img = np.zeros((6, 6, 1), np.float32)
        out = np.asarray(
            warp_affine(
                jnp.asarray(img), jnp.float32(0.0), jnp.float32(10.0),
                jnp.float32(0.0), fill=255.0,
            )
        )
        # Whole canvas shifted out of range -> all fill.
        np.testing.assert_allclose(out, 255.0)

    def test_rotation_preserves_center_and_range(self, rng):
        img = rng.integers(0, 256, (17, 17, 1)).astype(np.float32)
        out = np.asarray(
            warp_affine(
                jnp.asarray(img), jnp.float32(np.deg2rad(30)),
                jnp.float32(0.0), jnp.float32(0.0), fill=255.0,
            )
        )
        # Center pixel is a fixed point of rotation about the center.
        assert out[8, 8, 0] == pytest.approx(img[8, 8, 0], abs=1e-2)
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert np.isfinite(out).all()


class TestAugmentBatch:
    def test_shapes_dtype_determinism(self, rng):
        imgs = rng.integers(0, 256, (4, 8, 16, 1)).astype(np.uint8)
        key = jax.random.PRNGKey(7)
        a = np.asarray(augment_batch(jnp.asarray(imgs), key))
        b = np.asarray(augment_batch(jnp.asarray(imgs), key))
        assert a.shape == imgs.shape and a.dtype == np.float32
        np.testing.assert_array_equal(a, b)
        c = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(8)))
        assert not np.array_equal(a, c)

    def test_per_image_params_differ(self, rng):
        # Same image twice in the batch must (almost surely) warp differently.
        img = rng.integers(0, 256, (8, 16, 1)).astype(np.uint8)
        batch = np.stack([img, img])
        out = np.asarray(augment_batch(jnp.asarray(batch), jax.random.PRNGKey(3)))
        assert not np.array_equal(out[0], out[1])

    def test_zero_magnitude_is_identity(self, rng):
        imgs = rng.integers(0, 256, (2, 8, 16, 1)).astype(np.uint8)
        out = np.asarray(
            augment_batch(
                jnp.asarray(imgs), jax.random.PRNGKey(0),
                max_rotate_deg=0.0, max_translate_frac=0.0,
            )
        )
        np.testing.assert_allclose(out, imgs.astype(np.float32), atol=1e-3)


class TestTrainStepWiring:
    def _run_step(self, augment_device: bool):
        cfg = tiny_cfg()
        cfg.data.augment_device = augment_device
        vocab = 32
        model = build_model(cfg, vocab)
        tx = build_optimizer(cfg)
        state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, tx, cfg, pad_id=0))
        images, formulas = synthetic_batch(4, cfg.image_shape, 10, vocab, seed=0)
        batch = {"images": jnp.asarray(images), "formulas": jnp.asarray(formulas)}
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["loss"])

    def test_augmented_step_runs_and_differs(self):
        loss_plain = self._run_step(False)
        loss_aug = self._run_step(True)
        assert np.isfinite(loss_plain) and np.isfinite(loss_aug)
        # The warp perturbs the pixels, so the loss must move.
        assert loss_plain != loss_aug

    def test_augmented_dp_matches_single_device(self):
        """The warp's randomness derives from the (replicated) step rng, so
        an 8-way data-parallel augmented step must reproduce the
        single-device loss exactly — augmentation is sharding-transparent."""
        from img2latex_tpu.parallel.mesh import (
            create_mesh, put_batch, put_state, shard_train_step,
        )

        def setup():
            cfg = tiny_cfg()
            cfg.data.augment_device = True
            vocab = 32
            model = build_model(cfg, vocab)
            tx = build_optimizer(cfg)
            state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
            step = make_train_step(model, tx, cfg, pad_id=0)
            images, formulas = synthetic_batch(8, cfg.image_shape, 10, vocab, seed=0)
            batch = {"images": jnp.asarray(images), "formulas": jnp.asarray(formulas)}
            return cfg, model, state, step, batch

        _, _, state, step, batch = setup()
        _, m1 = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

        _, _, state2, step2, batch2 = setup()
        mesh = create_mesh((-1, 1))
        state2 = put_state(state2, mesh)
        batch2 = put_batch(batch2, mesh)
        sharded = shard_train_step(step2, mesh, state2, batch2)
        _, m2 = sharded(state2, batch2, jax.random.PRNGKey(1))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        assert int(m1["correct"]) == int(m2["correct"])
