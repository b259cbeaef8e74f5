import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.data.synthetic import synthetic_batch
from img2latex_tpu.models.seq2seq import build_model
from img2latex_tpu.parallel.mesh import (
    create_mesh,
    put_batch,
    put_state,
    shard_train_step,
    state_shardings,
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


class TestMesh:
    def test_create_mesh_fill(self):
        mesh = create_mesh((-1, 1))
        assert mesh.shape["data"] == jax.device_count()
        assert mesh.shape["model"] == 1

    def test_create_mesh_two_axes(self):
        mesh = create_mesh((-1, 2))
        assert mesh.shape["data"] * 2 == jax.device_count()

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            create_mesh((3, 3))  # 9 != 8

    def test_device_subset(self):
        mesh = create_mesh((-1, 1), devices=jax.devices()[:4])
        assert mesh.shape["data"] == 4


class TestShardedTraining:
    def _setup(self, mesh_shape, vocab=64, batch=8):
        cfg = tiny_cfg()
        cfg.hardware.mesh_shape = mesh_shape
        mesh = create_mesh(mesh_shape)
        model = build_model(cfg, vocab)
        tx = build_optimizer(cfg)
        state = create_train_state(model, tx, cfg, jax.random.PRNGKey(0))
        step = make_train_step(model, tx, cfg, pad_id=0)
        images, formulas = synthetic_batch(batch, cfg.image_shape, 10, vocab, seed=0)
        batch_d = {"images": jnp.asarray(images), "formulas": jnp.asarray(formulas)}
        return cfg, mesh, state, step, batch_d

    def test_dp_matches_single_device(self):
        """Same batch, same params: 8-way DP loss == single-device loss."""
        cfg, mesh, state, step, batch = self._setup((-1, 1))
        single = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        _, m1 = single

        cfg2, mesh2, state2, step2, batch2 = self._setup((-1, 1))
        state2 = put_state(state2, mesh2)
        batch2 = put_batch(batch2, mesh2)
        sharded = shard_train_step(step2, mesh2, state2, batch2)
        new_state, m2 = sharded(state2, batch2, jax.random.PRNGKey(1))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        assert int(m1["correct"]) == int(m2["correct"])

    def test_dp_tp_mesh_runs_and_matches(self):
        cfg, mesh, state, step, batch = self._setup((-1, 2))
        ref = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        _, m_ref = ref

        state_s = put_state(state, mesh)
        batch_s = put_batch(batch, mesh)
        sharded = shard_train_step(step, mesh, state_s, batch_s)
        new_state, m = sharded(state_s, batch_s, jax.random.PRNGKey(1))
        assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), rel=1e-4)
        # vocab projection actually sharded over the model axis
        sh = state_shardings(mesh, state_s)
        out_kernel_sh = sh.params["decoder"]["cell"]["out"]["kernel"]
        assert "model" in str(out_kernel_sh.spec)

    def test_param_updates_propagate(self):
        cfg, mesh, state, step, batch = self._setup((-1, 1))
        state = put_state(state, mesh)
        batch = put_batch(batch, mesh)
        sharded = shard_train_step(step, mesh, state, batch)
        before = np.asarray(
            jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
        ).copy()
        new_state, _ = sharded(state, batch, jax.random.PRNGKey(2))
        after = np.asarray(jax.tree_util.tree_leaves(jax.device_get(new_state.params))[0])
        assert not np.allclose(before, after)


class TestShardedDecode:
    """Data-parallel greedy decode across the mesh == single-device decode."""

    def test_decode_sharded_matches_unsharded(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
        from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model, init_decoder_carry
        from img2latex_tpu.ops.preprocess import normalize_images

        cfg = tiny_cfg()
        vocab, B = 32, 16
        model = build_model(cfg, vocab)
        h, w, c = cfg.image_shape
        images = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, size=(B, h, w, c), dtype=np.uint8)
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, h, w, c)), jnp.zeros((2, 5), jnp.int32)
        )
        dcfg = DecodeConfig(max_length=12, start_id=1, end_id=2, pad_id=0)

        def decode(params, images_u8):
            x = normalize_images(images_u8)
            memory = model.apply(params, x, method=Seq2SeqModel.encode)

            def step_fn(tokens, carry):
                return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

            carry0 = init_decoder_carry(cfg.model.decoder.lstm_layers, B, cfg.model.decoder.hidden_dim)
            return greedy_sample_decode(step_fn, carry0, B, dcfg)

        ref = jax.jit(decode)(params, images)

        mesh = create_mesh((-1, 1))
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        images_s = jax.device_put(images, NamedSharding(mesh, P("data")))
        sharded = jax.jit(
            decode,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        got = sharded(params_s, images_s)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        # output really is distributed over the data axis
        assert len(got.sharding.device_set) == jax.device_count()
