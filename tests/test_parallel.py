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


# ---------------------------------------------------------------------------
# Product-path mesh wiring: Trainer/validate/device_cache actually shard
# (these pin the API users run, not a parallel reimplementation)
# ---------------------------------------------------------------------------


import os

from img2latex_tpu.data.pipeline import create_data_loaders, read_formulas
from img2latex_tpu.data.synthetic import write_synthetic_corpus
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def mesh_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("meshcorpus")
    return write_synthetic_corpus(str(root), n_train=32, n_val=8, n_test=8, seed=7)


def _product_cfg(data_dir):
    cfg = tiny_cfg()
    cfg.data.data_dir = data_dir
    cfg.data.batch_size = 8
    cfg.data.max_seq_length = 16
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 96
    cfg.model.encoder.cnn.conv_filters = [4]
    cfg.training.epochs = 1
    return cfg


def _product_trainer(corpus, use_mesh, device_cache=False, mesh_shape=(-1, 1)):
    cfg = _product_cfg(corpus)
    cfg.hardware.use_mesh = use_mesh
    cfg.hardware.mesh_shape = mesh_shape
    cfg.data.device_cache = device_cache
    tok = LaTeXTokenizer(max_sequence_length=cfg.data.max_seq_length)
    tok.fit(read_formulas(os.path.join(corpus, "im2latex_formulas.norm.lst")))
    loaders = create_data_loaders(cfg, tok)
    return Trainer(cfg, tok, loaders, experiment_name="meshtest")


class TestTrainerMesh:
    def test_auto_mesh_shards_product_train_path(self, mesh_corpus):
        """`Trainer` with default config on >1 device trains SPMD: the state
        lives on all mesh devices and the epoch runs the sharded step."""
        tr = _product_trainer(mesh_corpus, use_mesh=None)
        assert tr.mesh is not None
        assert tr.mesh.shape["data"] == jax.device_count()
        metrics = tr.train_epoch(0)
        assert np.isfinite(metrics["train_loss"])
        leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
        assert len(leaf.sharding.device_set) == jax.device_count()

    def test_mesh_loss_matches_single_device(self, mesh_corpus):
        """Same data, same seed: the sharded product path reproduces the
        single-device trainer's epoch loss."""
        a = _product_trainer(mesh_corpus, use_mesh=None)
        b = _product_trainer(mesh_corpus, use_mesh=False)
        ma = a.train_epoch(0)
        mb = b.train_epoch(0)
        assert ma["train_loss"] == pytest.approx(mb["train_loss"], rel=1e-5)
        assert ma["train_accuracy"] == pytest.approx(mb["train_accuracy"], abs=1e-6)

    def test_tp_axis_shards_vocab_projection(self, mesh_corpus):
        tr = _product_trainer(mesh_corpus, use_mesh=None, mesh_shape=(-1, 2))
        assert tr.mesh.shape["model"] == 2
        out_kernel = tr.state.params["decoder"]["cell"]["out"]["kernel"]
        assert "model" in str(out_kernel.sharding.spec)
        metrics = tr.train_epoch(0)
        assert np.isfinite(metrics["train_loss"])

    def test_validate_mesh_matches_single_device(self, mesh_corpus):
        a = _product_trainer(mesh_corpus, use_mesh=None)
        b = _product_trainer(mesh_corpus, use_mesh=False)
        va = a.validate(0)
        vb = b.validate(0)
        assert va["val_loss"] == pytest.approx(vb["val_loss"], rel=1e-5)
        assert va["val_accuracy"] == pytest.approx(vb["val_accuracy"], abs=1e-6)
        assert va["val_bleu"] == pytest.approx(vb["val_bleu"], abs=1e-6)

    def test_device_cache_shards_over_mesh(self, mesh_corpus):
        """data.device_cache under a mesh: the HBM cache itself is sharded
        P('data') on the sample axis and training still learns."""
        tr = _product_trainer(mesh_corpus, use_mesh=None, device_cache=True)
        cache = tr._get_device_cache()
        assert cache
        assert "data" in str(cache["images"].sharding.spec)
        assert len(cache["images"].sharding.device_set) == jax.device_count()
        m0 = tr.train_epoch(0)
        m1 = tr.train_epoch(1)
        assert np.isfinite(m0["train_loss"]) and np.isfinite(m1["train_loss"])
        assert m1["train_loss"] < m0["train_loss"] + 0.5  # sane trajectory

    def test_use_mesh_false_stays_single_device(self, mesh_corpus):
        tr = _product_trainer(mesh_corpus, use_mesh=False)
        assert tr.mesh is None
        leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
        assert len(getattr(leaf.sharding, "device_set", {0})) == 1

    def test_use_mesh_true_with_indivisible_batch_raises(self):
        """Explicit use_mesh=True must never silently fall back to the
        single-device jit (1-of-N-chips training with no error): a batch
        that shares no divisor with the device pool raises."""
        from img2latex_tpu.parallel.mesh import product_mesh

        cfg = Config()
        cfg.hardware.use_mesh = True
        with pytest.raises(ValueError, match="use_mesh=True"):
            product_mesh(cfg, 7)  # gcd(7, 8 cpu devices) == 1
        # auto mode degrades (with a warning), explicit True does not
        cfg.hardware.use_mesh = None
        assert product_mesh(cfg, 7) is None


class TestPredictorMesh:
    """Predictor/evaluate product path shards decode over the mesh."""

    def _predictor(self, use_mesh, vocab=32, B=8):
        from img2latex_tpu.training.predictor import Predictor

        cfg = tiny_cfg()
        cfg.hardware.use_mesh = use_mesh
        cfg.hardware.use_pallas_decode = False
        model = build_model(cfg, vocab)
        h, w, c = cfg.image_shape
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, h, w, c)), jnp.zeros((2, 5), jnp.int32)
        )
        tok_vocab = {f"t{i}": i for i in range(vocab)}
        from img2latex_tpu.data.tokenizer import LaTeXTokenizer

        tok = LaTeXTokenizer(max_sequence_length=12)
        tok.from_vocab(tok_vocab) if hasattr(tok, "from_vocab") else tok.default_init()
        return Predictor(cfg, model, params["params"], {}, tok, batch_size=B), cfg

    def test_mesh_decode_matches_single_device(self):
        pred_m, cfg = self._predictor(use_mesh=None)
        pred_s, _ = self._predictor(use_mesh=False)
        h, w, c = cfg.image_shape
        imgs = np.random.default_rng(0).integers(0, 256, size=(8, h, w, c), dtype=np.uint8)
        ids_m = pred_m.predict_batch(list(imgs), return_ids=True, beam_size=0)
        ids_s = pred_s.predict_batch(list(imgs), return_ids=True, beam_size=0)
        assert ids_m == ids_s

    def test_mesh_decode_output_is_sharded(self):
        from img2latex_tpu.decoding.decode import DecodeConfig

        pred, cfg = self._predictor(use_mesh=None)
        tok = pred.tokenizer
        dcfg = DecodeConfig(
            max_length=8, start_id=tok.start_token_id, end_id=tok.end_token_id,
            pad_id=tok.pad_token_id,
        )
        run = pred._decode_fn(8, dcfg)
        h, w, c = cfg.image_shape
        imgs = jnp.zeros((8, h, w, c), jnp.uint8)
        out = run(imgs, jax.random.PRNGKey(0))
        assert len(out.sharding.device_set) == jax.device_count()

    def test_mesh_beam_matches_single_device(self):
        pred_m, cfg = self._predictor(use_mesh=None)
        pred_s, _ = self._predictor(use_mesh=False)
        h, w, c = cfg.image_shape
        imgs = np.random.default_rng(1).integers(0, 256, size=(8, h, w, c), dtype=np.uint8)
        ids_m = pred_m.predict_batch(list(imgs), return_ids=True, beam_size=3)
        ids_s = pred_s.predict_batch(list(imgs), return_ids=True, beam_size=3)
        assert ids_m == ids_s


class TestPredictorMeshPallas:
    """Sharded Pallas kernel paths (shard_map around the whole-decode
    kernels, incl. the grid tuple-weights plumbing) — exercised on the
    virtual 8-device mesh in interpret mode (hardware.pallas_interpret)."""

    def _predictor(self, memory, use_mesh, vocab=32, B=8):
        from img2latex_tpu.data.tokenizer import LaTeXTokenizer
        from img2latex_tpu.training.predictor import Predictor

        cfg = tiny_cfg()
        cfg.model.memory = memory
        cfg.hardware.use_mesh = use_mesh
        cfg.hardware.use_pallas_decode = True
        cfg.hardware.pallas_interpret = True
        cfg.hardware.pallas_conv1 = False
        model = build_model(cfg, vocab)
        h, w, c = cfg.image_shape
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, h, w, c)), jnp.zeros((2, 5), jnp.int32)
        )
        tok = LaTeXTokenizer(max_sequence_length=12)
        tok.default_init()
        return Predictor(cfg, model, params["params"], {}, tok, batch_size=B), cfg

    @pytest.mark.parametrize("memory", ["vector", "grid"])
    def test_sharded_kernel_greedy_matches_single(self, memory):
        pred_m, cfg = self._predictor(memory, use_mesh=None)
        pred_s, _ = self._predictor(memory, use_mesh=False)
        h, w, c = cfg.image_shape
        imgs = np.random.default_rng(0).integers(0, 256, size=(8, h, w, c), dtype=np.uint8)
        ids_m = pred_m.predict_batch(list(imgs), return_ids=True, beam_size=0)
        ids_s = pred_s.predict_batch(list(imgs), return_ids=True, beam_size=0)
        assert ids_m == ids_s

    @pytest.mark.parametrize("memory", ["vector", "grid"])
    def test_sharded_kernel_beam_matches_single(self, memory):
        pred_m, cfg = self._predictor(memory, use_mesh=None)
        pred_s, _ = self._predictor(memory, use_mesh=False)
        h, w, c = cfg.image_shape
        imgs = np.random.default_rng(1).integers(0, 256, size=(8, h, w, c), dtype=np.uint8)
        ids_m = pred_m.predict_batch(list(imgs), return_ids=True, beam_size=3)
        ids_s = pred_s.predict_batch(list(imgs), return_ids=True, beam_size=3)
        assert ids_m == ids_s

    def test_sharded_kernel_sampling_runs(self):
        pred, cfg = self._predictor("grid", use_mesh=None)
        h, w, c = cfg.image_shape
        imgs = np.random.default_rng(2).integers(0, 256, size=(8, h, w, c), dtype=np.uint8)
        out = pred.predict_batch(
            list(imgs), return_ids=True, temperature=0.8, top_k=4, seed=3
        )
        assert len(out) == 8
        for seq in out:
            assert all(0 <= t < pred.tokenizer.vocab_size for t in seq)
