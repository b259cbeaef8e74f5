import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.models.decoder import LSTMDecoder
from img2latex_tpu.models.encoder import CNNEncoder, ResNetEncoder
from img2latex_tpu.models.lstm import StackedLSTM
from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model, init_decoder_carry


class TestStackedLSTM:
    def test_matches_torch_lstm(self):
        """Same weights -> same outputs as torch.nn.LSTM (gate-order parity)."""
        torch = pytest.importorskip("torch")
        B, T, In, H, L = 2, 5, 6, 8, 2
        model = StackedLSTM(input_dim=In, hidden_dim=H, num_layers=L)
        rng = np.random.default_rng(0)
        xs = rng.normal(size=(B, T, In)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.array(xs))

        tl = torch.nn.LSTM(In, H, num_layers=L, batch_first=True)
        with torch.no_grad():
            for layer in range(L):
                p = params["params"]
                getattr(tl, f"weight_ih_l{layer}").copy_(
                    torch.tensor(np.array(p[f"W_ih_l{layer}"]).T)
                )
                getattr(tl, f"weight_hh_l{layer}").copy_(
                    torch.tensor(np.array(p[f"W_hh_l{layer}"]).T)
                )
                getattr(tl, f"bias_ih_l{layer}").copy_(torch.tensor(np.array(p[f"b_ih_l{layer}"])))
                getattr(tl, f"bias_hh_l{layer}").copy_(torch.tensor(np.array(p[f"b_hh_l{layer}"])))
            ref_out, (ref_h, ref_c) = tl(torch.tensor(xs))

        ys, (h, c) = model.apply(params, jnp.array(xs))
        np.testing.assert_allclose(np.asarray(ys), ref_out.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), ref_c.numpy(), atol=1e-5)

    def test_step_equals_full_sequence(self):
        B, T, In, H = 3, 7, 4, 6
        model = StackedLSTM(input_dim=In, hidden_dim=H, num_layers=2)
        xs = jnp.array(np.random.default_rng(1).normal(size=(B, T, In)), dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), xs)
        full, (hT, cT) = model.apply(params, xs)

        carry = (jnp.zeros((2, B, H)), jnp.zeros((2, B, H)))
        outs = []
        for t in range(T):
            y, carry = model.apply(params, xs[:, t, :], carry, method=StackedLSTM.step)
            outs.append(y)
        stepped = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(carry[0]), atol=1e-5)


class TestEncoders:
    def test_cnn_encoder_vector(self):
        enc = CNNEncoder(conv_filters=(8, 16), embedding_dim=32)
        x = jnp.zeros((2, 32, 64, 1))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (2, 32)
        assert (np.asarray(out) >= 0).all()  # final ReLU

    def test_cnn_encoder_grid(self):
        enc = CNNEncoder(conv_filters=(8, 16), embedding_dim=32, output="grid")
        x = jnp.zeros((2, 32, 64, 1))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (2, 16, 32)  # W/4 = 16 memory slots

    def test_fused_conv_pool_exact(self):
        """relu(max of 4 phase-shifted stride-2 convs) == maxpool(relu(conv))
        bit-exactly, from the SAME parameter tree (fused_pool is a pure
        execution-strategy flag; checkpoints are interchangeable)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 1)).astype(np.float32))
        for output in ("vector", "grid"):
            plain = CNNEncoder(conv_filters=(8, 16, 32), embedding_dim=32, output=output)
            fused = CNNEncoder(
                conv_filters=(8, 16, 32), embedding_dim=32, output=output, fused_pool=True
            )
            params = plain.init(jax.random.PRNGKey(0), x)
            assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
                fused.init(jax.random.PRNGKey(0), x)
            )
            a = np.asarray(plain.apply(params, x))
            b = np.asarray(fused.apply(params, x))
            np.testing.assert_array_equal(a, b)

    def test_fused_conv_pool_gradient_parity(self):
        """Backward pass matches the plain path (float tolerance: conv
        backward reduction order differs), so the flag is safe in training."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
        plain = CNNEncoder(conv_filters=(8, 16), embedding_dim=32)
        fused = CNNEncoder(conv_filters=(8, 16), embedding_dim=32, fused_pool=True)
        params = plain.init(jax.random.PRNGKey(0), x)
        gp = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
        gf = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_fused_conv_pool_odd_dims_fall_back(self):
        """Odd spatial dims at any block fall back to the plain path (the
        phase decomposition needs even H/W), still from the same params."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 30, 50, 1)).astype(np.float32))
        plain = CNNEncoder(conv_filters=(8, 16), embedding_dim=32)
        fused = CNNEncoder(conv_filters=(8, 16), embedding_dim=32, fused_pool=True)
        params = plain.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(plain.apply(params, x)), np.asarray(fused.apply(params, x))
        )

    @pytest.mark.parametrize("name,feat", [("resnet18", 512), ("resnet50", 2048)])
    def test_resnet_encoder(self, name, feat):
        enc = ResNetEncoder(model_name=name, embedding_dim=64)
        x = jnp.zeros((1, 64, 96, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables
        out = enc.apply(variables, x)
        assert out.shape == (1, 64)

    def test_resnet_train_mode_updates_stats(self):
        enc = ResNetEncoder(model_name="resnet18", embedding_dim=16)
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), dtype=jnp.float32)
        variables = enc.init(jax.random.PRNGKey(0), x)
        out, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 16)
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestDecoder:
    V, E, H, L = 20, 16, 24, 2

    def _decoder(self, use_attention=True):
        return LSTMDecoder(
            vocab_size=self.V,
            embedding_dim=self.E,
            hidden_dim=self.H,
            lstm_layers=self.L,
            use_attention=use_attention,
        )

    def test_teacher_forced_shape(self):
        dec = self._decoder()
        memory = jnp.zeros((3, 1, self.E))
        targets = jnp.zeros((3, 10), dtype=jnp.int32)
        params = dec.init(jax.random.PRNGKey(0), memory, targets)
        logits = dec.apply(params, memory, targets)
        assert logits.shape == (3, 10, self.V)

    def test_fast_path_matches_stepping(self):
        """Vector-memory full-sequence logits == repeated decode_step."""
        dec = self._decoder()
        rng = np.random.default_rng(0)
        B, T = 2, 6
        memory = jnp.array(rng.normal(size=(B, 1, self.E)), dtype=jnp.float32)
        targets = jnp.array(rng.integers(0, self.V, size=(B, T)), dtype=jnp.int32)
        params = dec.init(jax.random.PRNGKey(0), memory, targets)
        full = dec.apply(params, memory, targets)

        carry = init_decoder_carry(self.L, B, self.H)
        outs = []
        for t in range(T):
            logits, carry = dec.apply(
                params, memory, targets[:, t], carry, method=LSTMDecoder.decode_step
            )
            outs.append(logits)
        stepped = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=1e-5)

    def test_grid_attention_path(self):
        dec = self._decoder()
        B, S, T = 2, 5, 4
        memory = jnp.array(np.random.default_rng(1).normal(size=(B, S, self.E)), dtype=jnp.float32)
        targets = jnp.zeros((B, T), dtype=jnp.int32)
        params = dec.init(jax.random.PRNGKey(0), memory, targets)
        logits = dec.apply(params, memory, targets)
        assert logits.shape == (B, T, self.V)
        # grid scan must agree with manual stepping too
        carry = init_decoder_carry(self.L, B, self.H)
        outs = []
        for t in range(T):
            lg, carry = dec.apply(
                params, memory, targets[:, t], carry, method=LSTMDecoder.decode_step
            )
            outs.append(lg)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(jnp.stack(outs, axis=1)), atol=1e-5
        )

    def test_attention_weights_sum_to_one(self):
        from img2latex_tpu.models.decoder import AdditiveAttention

        att = AdditiveAttention(hidden_dim=self.H, mem_dim=self.E)
        h = jnp.array(np.random.default_rng(2).normal(size=(3, self.H)), dtype=jnp.float32)
        mem = jnp.array(np.random.default_rng(3).normal(size=(3, 7, self.E)), dtype=jnp.float32)
        params = att.init(jax.random.PRNGKey(0), h, mem)
        ctx, w = att.apply(params, h, mem)
        assert ctx.shape == (3, self.E)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(3), atol=1e-6)

    def test_split_attention_equals_concat_dense(self):
        """The split matmul (hoistable memory half) reproduces the reference
        formulation v . tanh(Dense([h; m_s])) with the SAME (H+E, A) kernel
        (reference decoder.py:309-343)."""
        from img2latex_tpu.models.decoder import AdditiveAttention

        att = AdditiveAttention(hidden_dim=self.H, mem_dim=self.E)
        rng = np.random.default_rng(4)
        h = jnp.array(rng.normal(size=(3, self.H)), dtype=jnp.float32)
        mem = jnp.array(rng.normal(size=(3, 7, self.E)), dtype=jnp.float32)
        params = att.init(jax.random.PRNGKey(1), h, mem)
        kern = params["params"]["attn"]["kernel"]  # (H+E, A)
        bias = params["params"]["attn"]["bias"]
        v = params["params"]["v"]["kernel"][:, 0]
        assert kern.shape == (self.H + self.E, self.H)
        h_rep = jnp.broadcast_to(h[:, None, :], (3, 7, self.H))
        energy = jnp.tanh(jnp.concatenate([h_rep, mem], axis=-1) @ kern + bias)
        scores = energy @ v
        w_ref = jax.nn.softmax(scores, axis=-1)
        ctx_ref = jnp.einsum("bs,bse->be", w_ref, mem)
        ctx, w = att.apply(params, h, mem)
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
        # hoisted-projection call path is identical
        u = att.apply(params, mem, method=AdditiveAttention.memory_proj)
        ctx2, w2 = att.apply(params, h, mem, mem_proj=u)
        np.testing.assert_array_equal(np.asarray(ctx), np.asarray(ctx2))
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))


class TestSeq2Seq:
    def test_cnn_lstm_forward(self):
        model = Seq2SeqModel(
            model_type="cnn_lstm",
            vocab_size=30,
            embedding_dim=32,
            hidden_dim=32,
            lstm_layers=2,
            conv_filters=(8, 16),
        )
        images = jnp.zeros((2, 32, 64, 1))
        targets = jnp.zeros((2, 12), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, targets)
        logits = model.apply(params, images, targets)
        assert logits.shape == (2, 11, 30)  # T-1 outputs

    def test_build_model_from_config(self):
        cfg = Config()
        cfg.model.embedding_dim = 16
        cfg.model.decoder.hidden_dim = 16
        cfg.model.encoder.cnn.conv_filters = [4, 8]
        cfg.hardware.compute_dtype = "float32"
        model = build_model(cfg, vocab_size=10)
        assert model.model_type == "cnn_lstm"
        images = jnp.zeros((1, 32, 64, 1))
        targets = jnp.zeros((1, 5), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, targets)
        out = model.apply(params, images, targets)
        assert out.shape == (1, 4, 10)

    def test_encode_decode_step(self):
        model = Seq2SeqModel(
            model_type="cnn_lstm",
            vocab_size=15,
            embedding_dim=16,
            hidden_dim=16,
            lstm_layers=1,
            conv_filters=(4,),
        )
        images = jnp.zeros((2, 16, 32, 1))
        targets = jnp.zeros((2, 5), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, targets)
        memory = model.apply(params, images, method=Seq2SeqModel.encode)
        assert memory.shape == (2, 1, 16)
        carry = init_decoder_carry(1, 2, 16)
        logits, carry2 = model.apply(
            params, memory, jnp.array([1, 1]), carry, method=Seq2SeqModel.decode_step
        )
        assert logits.shape == (2, 15)

    def test_dropout_requires_rng_and_changes_output(self):
        model = Seq2SeqModel(
            model_type="cnn_lstm",
            vocab_size=12,
            embedding_dim=16,
            hidden_dim=16,
            lstm_layers=2,
            dropout=0.5,
            conv_filters=(4,),
        )
        images = jnp.array(
            np.random.default_rng(0).normal(size=(2, 16, 32, 1)), dtype=jnp.float32
        )
        targets = jnp.ones((2, 6), dtype=jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, targets)
        a = model.apply(params, images, targets, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        b = model.apply(params, images, targets, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        det = model.apply(params, images, targets)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(det))


class TestLSTMGradients:
    def test_grad_matches_torch(self):
        """Backward pass parity: d(sum(y))/d(weights) == torch."""
        torch = pytest.importorskip("torch")
        B, T, In, H, L = 2, 4, 5, 6, 2
        model = StackedLSTM(input_dim=In, hidden_dim=H, num_layers=L)
        rng = np.random.default_rng(3)
        xs = rng.normal(size=(B, T, In)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(1), jnp.array(xs))

        def loss_fn(p, x):
            ys, _ = model.apply(p, x)
            return jnp.sum(ys)

        grads = jax.grad(loss_fn)(params, jnp.array(xs))["params"]

        tl = torch.nn.LSTM(In, H, num_layers=L, batch_first=True)
        with torch.no_grad():
            for layer in range(L):
                p = params["params"]
                getattr(tl, f"weight_ih_l{layer}").copy_(
                    torch.tensor(np.array(p[f"W_ih_l{layer}"]).T)
                )
                getattr(tl, f"weight_hh_l{layer}").copy_(
                    torch.tensor(np.array(p[f"W_hh_l{layer}"]).T)
                )
                getattr(tl, f"bias_ih_l{layer}").copy_(torch.tensor(np.array(p[f"b_ih_l{layer}"])))
                getattr(tl, f"bias_hh_l{layer}").copy_(torch.tensor(np.array(p[f"b_hh_l{layer}"])))
        out, _ = tl(torch.tensor(xs))
        out.sum().backward()
        for layer in range(L):
            np.testing.assert_allclose(
                np.asarray(grads[f"W_ih_l{layer}"]),
                getattr(tl, f"weight_ih_l{layer}").grad.numpy().T,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(grads[f"b_hh_l{layer}"]),
                getattr(tl, f"bias_hh_l{layer}").grad.numpy(),
                atol=1e-4,
            )
