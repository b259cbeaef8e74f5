"""Parity tests for the training LSTM kernel (ops/pallas/lstm_train.py):
forward and custom-VJP backward vs the XLA lax.scan reference
(models/lstm.py::lstm_cell_step), interpret mode, float32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.models.lstm import lstm_cell_step
from img2latex_tpu.ops.pallas.lstm_train import lstm_seq_pallas


def scan_ref(gates_x, h0, c0, w_hh):
    """Reference: lax.scan over lstm_cell_step with the biases pre-folded
    into gates_x (exactly how StackedLSTM.__call__ hoists them)."""
    zero_b = jnp.zeros((w_hh.shape[1],), gates_x.dtype)

    def step(hc, gx):
        h, c = hc
        h2, c2 = lstm_cell_step(gx, h, c, w_hh, zero_b)
        return (h2, c2), h2

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), gates_x)
    return ys, hT, cT


def make_inputs(T, B, H, seed=0):
    rng = np.random.default_rng(seed)
    gates_x = jnp.asarray(rng.normal(size=(T, B, 4 * H)).astype(np.float32) * 0.5)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.3)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.3)
    w_hh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.2)
    return gates_x, h0, c0, w_hh


class TestForward:
    @pytest.mark.parametrize("T,B,H", [(5, 4, 8), (7, 16, 16), (3, 8, 8)])
    def test_matches_scan(self, T, B, H):
        args = make_inputs(T, B, H)
        ys_r, hT_r, cT_r = scan_ref(*args)
        ys, hT, cT = lstm_seq_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_r), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_r), rtol=1e-5, atol=1e-5)

    def test_multi_tile_matches_single(self):
        """batch_tile=8 over B=16 must equal the single-tile result (per-tile
        carry reset + per-tile dW path)."""
        args = make_inputs(6, 16, 8, seed=3)
        ys_a, hT_a, cT_a = lstm_seq_pallas(*args, interpret=True, batch_tile=16)
        ys_b, hT_b, cT_b = lstm_seq_pallas(*args, interpret=True, batch_tile=8)
        np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(cT_a), np.asarray(cT_b), rtol=1e-6)

    def test_pads_odd_batch(self):
        """B=5 pads to 8 internally; outputs slice back to 5 rows."""
        args = make_inputs(4, 5, 8, seed=5)
        ys_r, hT_r, cT_r = scan_ref(*args)
        ys, hT, cT = lstm_seq_pallas(*args, interpret=True)
        assert ys.shape == (4, 5, 8)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r), rtol=1e-5, atol=1e-5)


class TestBackward:
    def _loss(self, fn):
        def loss(gates_x, h0, c0, w_hh):
            ys, hT, cT = fn(gates_x, h0, c0, w_hh)
            # weights every output path: the sequence, final h, final c
            return (
                jnp.sum(jnp.sin(ys * 1.3))
                + 2.0 * jnp.sum(hT**2)
                + 0.5 * jnp.sum(jnp.cos(cT))
            )

        return loss

    @pytest.mark.parametrize("T,B,H", [(5, 4, 8), (6, 16, 16)])
    def test_grads_match_scan(self, T, B, H):
        args = make_inputs(T, B, H, seed=7)
        g_ref = jax.grad(self._loss(scan_ref), argnums=(0, 1, 2, 3))(*args)
        g_ker = jax.grad(
            self._loss(lambda *a: lstm_seq_pallas(*a, interpret=True)),
            argnums=(0, 1, 2, 3),
        )(*args)
        for name, a, b in zip(("dgates_x", "dh0", "dc0", "dw_hh"), g_ker, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
            )

    def test_grads_multi_tile(self):
        """dW_hh must sum correctly across batch tiles."""
        args = make_inputs(5, 16, 8, seed=11)
        g_a = jax.grad(
            self._loss(lambda *a: lstm_seq_pallas(*a, interpret=True, batch_tile=16)),
            argnums=(0, 3),
        )(*args)
        g_b = jax.grad(
            self._loss(lambda *a: lstm_seq_pallas(*a, interpret=True, batch_tile=8)),
            argnums=(0, 3),
        )(*args)
        for a, b in zip(g_a, g_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_grads_odd_batch(self):
        """Padding rows must contribute zero gradient."""
        args = make_inputs(4, 5, 8, seed=13)
        g_ref = jax.grad(self._loss(scan_ref), argnums=(0, 1, 2, 3))(*args)
        g_ker = jax.grad(
            self._loss(lambda *a: lstm_seq_pallas(*a, interpret=True)),
            argnums=(0, 1, 2, 3),
        )(*args)
        for name, a, b in zip(("dgates_x", "dh0", "dc0", "dw_hh"), g_ker, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
            )


class TestModelIntegration:
    """hardware.pallas_lstm=True routes StackedLSTM full-sequence forwards
    through the kernel (interpret on CPU) with an identical param tree."""

    def _cfg(self, flag):
        from img2latex_tpu.config import Config

        cfg = Config()
        cfg.model.name = "cnn_lstm"
        cfg.model.embedding_dim = 32
        cfg.model.decoder.hidden_dim = 24
        cfg.model.decoder.lstm_layers = 2
        cfg.model.decoder.dropout = 0.0
        cfg.model.encoder.cnn.img_height = 32
        cfg.model.encoder.cnn.img_width = 64
        cfg.model.encoder.cnn.conv_filters = [4, 8]
        cfg.data.max_seq_length = 10
        cfg.hardware.compute_dtype = "float32"
        cfg.hardware.pallas_lstm = flag
        return cfg

    def test_forward_and_grads_match_scan(self):
        from img2latex_tpu.models.seq2seq import build_model

        V = 30
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(size=(4, 32, 64, 1)).astype(np.float32))
        tokens = jnp.asarray(rng.integers(0, V, size=(4, 10), dtype=np.int32))

        m_scan = build_model(self._cfg(False), V)
        m_ker = build_model(self._cfg(True), V)
        params = m_scan.init(jax.random.PRNGKey(0), images, tokens)
        # identical param tree: the kernel path must not add/rename params
        params2 = m_ker.init(jax.random.PRNGKey(0), images, tokens)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)

        out_a = m_scan.apply(params, images, tokens)
        out_b = m_ker.apply(params, images, tokens)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-4, atol=1e-4)

        def loss(m):
            def f(p):
                return jnp.mean(m.apply(p, images, tokens).astype(jnp.float32) ** 2)

            return f

        g_a = jax.grad(loss(m_scan))(params)
        g_b = jax.grad(loss(m_ker))(params)
        flat_a = jax.tree_util.tree_leaves_with_path(g_a)
        flat_b = jax.tree_util.tree_leaves(g_b)
        for (path, a), b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=jax.tree_util.keystr(path),
            )
