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
from img2latex_tpu.ops.augment import (
    _shift_x,
    _shift_y,
    augment_batch,
    warp_affine,
    warp_shear3_batch,
)
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


def _gather_shift(img_f, d, axis, fill):
    """take_along_axis reference for the roll+select fractional shifts."""
    size = img_f.shape[axis]
    x0 = jnp.floor(d)
    x0i = x0.astype(jnp.int32)
    if axis == 2:  # d is (B, H)
        frac = (d - x0)[:, :, None, None]
        base = jnp.arange(size, dtype=jnp.int32)[None, None, :]
        idx0 = base + x0i[:, :, None]
    else:  # axis == 1, d is (B, W)
        frac = (d - x0)[:, None, :, None]
        base = jnp.arange(size, dtype=jnp.int32)[None, :, None]
        idx0 = base + x0i[:, None, :]
    ok0 = (idx0 >= 0) & (idx0 < size)
    ok1 = (idx0 + 1 >= 0) & (idx0 + 1 < size)
    i0 = jnp.clip(idx0, 0, size - 1)[..., None]
    i1 = jnp.clip(idx0 + 1, 0, size - 1)[..., None]
    v0 = jnp.take_along_axis(img_f, jnp.broadcast_to(i0, img_f.shape), axis=axis)
    v1 = jnp.take_along_axis(img_f, jnp.broadcast_to(i1, img_f.shape), axis=axis)
    v0 = jnp.where(ok0[..., None], v0, fill)
    v1 = jnp.where(ok1[..., None], v1, fill)
    return v0 * (1.0 - frac) + v1 * frac


class TestRollShifts:
    """The production warp is gather-free (rolls + masks, see ops/augment.py
    module docstring); these pin it exactly against a gather reference in
    both span regimes (direct select <=12 and coarse/fine 8q+r)."""

    @pytest.mark.parametrize("dmax", [3.5, 17.0])  # direct and coarse/fine
    def test_shift_x_matches_gather(self, rng, dmax):
        b, h, w, c = 3, 8, 64, 1
        img = jnp.asarray(rng.integers(0, 256, (b, h, w, c)).astype(np.float32))
        d = jnp.asarray(rng.uniform(-dmax, dmax, (b, h)).astype(np.float32))
        got = np.asarray(_shift_x(img, d, dmax, 255.0))
        want = np.asarray(_gather_shift(img, d, 2, 255.0))
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("dmax", [2.5, 20.0])
    def test_shift_y_matches_gather(self, rng, dmax):
        b, h, w, c = 3, 48, 16, 1
        img = jnp.asarray(rng.integers(0, 256, (b, h, w, c)).astype(np.float32))
        d = jnp.asarray(rng.uniform(-dmax, dmax, (b, w)).astype(np.float32))
        got = np.asarray(_shift_y(img, d, dmax, 255.0))
        want = np.asarray(_gather_shift(img, d, 1, 255.0))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_shear3_matches_gather_warp_interior(self, rng):
        """Same affine map as warp_affine; only the interpolation scheme
        differs (three 1-D lerps vs one 2-D bilinear tap), so on a smooth
        image the interiors agree to a fraction of a gray level.  Corners
        differ (the shears clip intermediate out-of-bounds) — excluded."""
        b, h, w = 4, 64, 96
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        smooth = (127.5 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)).astype(
            np.float32
        )
        imgs = jnp.asarray(np.broadcast_to(smooth[None, :, :, None], (b, h, w, 1)))
        theta = jnp.asarray(rng.uniform(-0.087, 0.087, (b,)).astype(np.float32))
        tx = jnp.asarray(rng.uniform(-1.9, 1.9, (b,)).astype(np.float32))
        ty = jnp.asarray(rng.uniform(-1.2, 1.2, (b,)).astype(np.float32))
        got = np.asarray(warp_shear3_batch(imgs, theta, tx, ty, 255.0, 5.0, 0.02))
        want = np.asarray(
            jax.vmap(warp_affine, in_axes=(0, 0, 0, 0, None))(
                imgs, theta, tx, ty, 255.0
            )
        )
        d = np.abs(got - want)[:, 4:-4, 8:-8, :]
        assert d.max() < 3.0 and d.mean() < 0.05

    def test_methods_agree_on_identity_params(self, rng):
        imgs = rng.integers(0, 256, (2, 8, 16, 1)).astype(np.uint8)
        for method in ("shear_roll", "gather"):
            out = np.asarray(
                augment_batch(
                    jnp.asarray(imgs), jax.random.PRNGKey(0),
                    max_rotate_deg=0.0, max_translate_frac=0.0, method=method,
                )
            )
            np.testing.assert_allclose(out, imgs.astype(np.float32), atol=1e-3)

    def test_unknown_method_raises(self, rng):
        imgs = jnp.asarray(rng.integers(0, 256, (1, 8, 16, 1)).astype(np.uint8))
        with pytest.raises(ValueError, match="unknown augment method"):
            augment_batch(imgs, jax.random.PRNGKey(0), method="bogus")


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
