"""int8 encoder fast path (ops/int8.py + CNNEncoder int8 flag).

The int8 path is numerically approximate by design (per-channel weight +
per-tensor activation symmetric quantization); these tests pin

* quantizer contracts (range, dtype, reconstruction error bound),
* int8 conv block vs the f32 block on well-conditioned data,
* parameter-tree identity with the f32 encoder (same checkpoint loads),
* end-to-end encoder closeness and flag plumbing through config/build_model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from img2latex_tpu.config import Config
from img2latex_tpu.models.encoder import CNNEncoder
from img2latex_tpu.models.seq2seq import build_model
from img2latex_tpu.ops.int8 import (
    conv_block_int8,
    quantize_per_channel,
    quantize_per_tensor,
)


class TestQuantizers:
    def test_per_channel_range_and_roundtrip(self, rng):
        k = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
        q, scale = quantize_per_channel(jnp.array(k))
        assert q.dtype == jnp.int8
        assert scale.shape == (16,)
        assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
        recon = np.asarray(q, dtype=np.float32) * np.asarray(scale)
        # Error bounded by half a quantization step per channel.
        err = np.abs(recon - k)
        assert np.all(err <= 0.5 * np.asarray(scale)[None, None, None, :] + 1e-7)

    def test_per_tensor_zero_input(self):
        q, scale = quantize_per_tensor(jnp.zeros((4, 4)))
        assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) == 0
        assert float(scale) > 0  # eps floor, no div-by-zero NaNs

    def test_per_channel_scales_channels_independently(self):
        k = np.zeros((1, 1, 1, 2), np.float32)
        k[..., 0] = 1.0
        k[..., 1] = 100.0
        q, scale = quantize_per_channel(jnp.array(k))
        # Both channels hit full scale despite 100x magnitude difference.
        assert int(q[0, 0, 0, 0]) == 127 and int(q[0, 0, 0, 1]) == 127


class TestConvBlockInt8:
    def test_close_to_f32_block(self, rng):
        x = rng.uniform(0.0, 1.0, size=(2, 16, 24, 8)).astype(np.float32)
        k = (rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32)
        b = (rng.normal(size=(16,)) * 0.05).astype(np.float32)

        ref = jax.lax.conv_general_dilated(
            jnp.array(x), jnp.array(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ref = jax.nn.relu(ref + b)
        ref = jax.lax.reduce_window(
            ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        got = conv_block_int8(jnp.array(x), jnp.array(k), jnp.array(b), 2, jnp.float32)
        assert got.shape == ref.shape
        denom = float(jnp.max(jnp.abs(ref))) + 1e-6
        rel = float(jnp.max(jnp.abs(got - ref))) / denom
        assert rel < 0.02, f"int8 block deviates {rel:.4f} relative"

    def test_odd_spatial_pools_like_max_pool(self, rng):
        # VALID pooling on odd H/W drops the trailing row/col, matching
        # flax nn.max_pool with stride == window.
        x = rng.uniform(0.0, 1.0, size=(1, 7, 9, 4)).astype(np.float32)
        k = (rng.normal(size=(3, 3, 4, 8)) * 0.1).astype(np.float32)
        b = np.zeros((8,), np.float32)
        got = conv_block_int8(jnp.array(x), jnp.array(k), jnp.array(b), 2, jnp.float32)
        assert got.shape == (1, 3, 4, 8)


class TestEncoderInt8:
    def _make(self, **kw):
        return CNNEncoder(conv_filters=(8, 16), embedding_dim=32, **kw)

    def test_param_tree_identical(self, rng):
        x = jnp.array(rng.uniform(0, 1, size=(2, 16, 32, 1)), dtype=jnp.float32)
        p_f32 = self._make().init(jax.random.PRNGKey(0), x)
        p_int8 = self._make(int8=True).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p_f32) == jax.tree_util.tree_structure(p_int8)
        for a, b in zip(jax.tree_util.tree_leaves(p_f32), jax.tree_util.tree_leaves(p_int8)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_output_close_to_f32(self, rng):
        x = jnp.array(rng.uniform(0, 1, size=(2, 16, 32, 1)), dtype=jnp.float32)
        enc = self._make()
        params = enc.init(jax.random.PRNGKey(0), x)
        ref = enc.apply(params, x)
        got = self._make(int8=True).apply(params, x)
        assert got.shape == ref.shape
        denom = float(jnp.max(jnp.abs(ref))) + 1e-6
        rel = float(jnp.max(jnp.abs(got - ref))) / denom
        assert rel < 0.05, f"int8 encoder deviates {rel:.4f} relative"

    def test_features_only_bucketing_split(self, rng):
        # The bucketing split point (features_only / from_features) works
        # with int8 blocks: the grid comes from the int8 stack, the head is
        # the exact f32 head.
        x = jnp.array(rng.uniform(0, 1, size=(2, 16, 32, 1)), dtype=jnp.float32)
        enc = self._make(int8=True)
        params = enc.init(jax.random.PRNGKey(0), x)
        feats = enc.apply(params, x, features_only=True)
        full = enc.apply(params, x)
        via_split = enc.apply(params, from_features=feats)
        np.testing.assert_allclose(np.asarray(full), np.asarray(via_split), atol=1e-5)

    def test_jit_compiles(self, rng):
        x = jnp.array(rng.uniform(0, 1, size=(2, 16, 32, 1)), dtype=jnp.float32)
        enc = self._make(int8=True)
        params = enc.init(jax.random.PRNGKey(0), x)
        out = jax.jit(lambda p, v: enc.apply(p, v))(params, x)
        assert out.shape == (2, 32)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestConfigPlumbing:
    def test_build_model_threads_flag(self):
        cfg = Config()
        cfg.hardware.int8_encoder = True
        model = build_model(cfg, vocab_size=40)
        assert model.int8_encoder is True
        # default off
        assert build_model(Config(), vocab_size=40).int8_encoder is False

    def test_seq2seq_forward_close(self, rng):
        cfg = Config()
        cfg.model.embedding_dim = 32
        cfg.model.decoder.hidden_dim = 32
        cfg.model.encoder.cnn.conv_filters = [8, 16]
        cfg.data.image_height, cfg.data.image_width = 16, 32
        base = build_model(cfg, vocab_size=40)
        cfg8 = Config()
        cfg8.model.embedding_dim = 32
        cfg8.model.decoder.hidden_dim = 32
        cfg8.model.encoder.cnn.conv_filters = [8, 16]
        cfg8.data.image_height, cfg8.data.image_width = 16, 32
        cfg8.hardware.int8_encoder = True
        q = build_model(cfg8, vocab_size=40)
        imgs = jnp.array(rng.uniform(0, 1, size=(2, 16, 32, 1)), dtype=jnp.float32)
        toks = jnp.array(rng.integers(0, 40, size=(2, 6)), dtype=jnp.int32)
        params = base.init(jax.random.PRNGKey(0), imgs, toks)
        ref = base.apply(params, imgs, toks)
        got = q.apply(params, imgs, toks)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-6
        rel = float(jnp.max(jnp.abs(got - ref))) / denom
        assert rel < 0.1, f"int8 seq2seq logits deviate {rel:.4f} relative"
