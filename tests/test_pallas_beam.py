"""Fused whole-beam-decode Pallas kernel: parity with the scan beam path.

Interpret mode on CPU (the kernel targets Mosaic; interpret=True executes
the same program semantics).  The scan path itself is oracle-tested against
an exhaustive numpy beam (tests/test_decoding.py), so equality here chains
to the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.decoding.decode import DecodeConfig, beam_decode
from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model, init_decoder_carry
from img2latex_tpu.ops.pallas.beam_decode import pallas_full_beam_decode
from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    cfg.model.embedding_dim = 128
    cfg.model.decoder.hidden_dim = 128
    cfg.model.decoder.lstm_layers = 2
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 64
    cfg.model.encoder.cnn.conv_filters = [4, 8]
    cfg.hardware.compute_dtype = "float32"
    V = 50
    model = build_model(cfg, V)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 64, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, jnp.zeros((8, 10), jnp.int32))
    memory = model.apply(params, imgs, method=Seq2SeqModel.encode)
    packed = pack_decoder_weights(params, V, dtype=jnp.float32)
    return cfg, model, params, memory, packed, V


def _scan_beam(cfg, model, params, memory, K, dcfg):
    B = memory.shape[0]
    mem_exp = jnp.repeat(memory, K, axis=0)

    def step_fn(tokens, carry):
        return model.apply(params, mem_exp, tokens, carry, method=Seq2SeqModel.decode_step)

    carry0 = init_decoder_carry(
        cfg.model.decoder.lstm_layers, B * K, cfg.model.decoder.hidden_dim
    )
    return beam_decode(step_fn, carry0, B, K, dcfg)


class TestFusedBeamParity:
    @pytest.mark.parametrize("K", [2, 5])
    def test_matches_scan_beam(self, setup, K):
        cfg, model, params, memory, packed, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=K)
        ref_tokens, ref_scores = _scan_beam(cfg, model, params, memory, K, dcfg)
        got_tokens, got_scores = pallas_full_beam_decode(
            packed, memory[:, 0, :], K, dcfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(got_tokens))
        np.testing.assert_allclose(
            np.asarray(ref_scores), np.asarray(got_scores), rtol=1e-5, atol=1e-5
        )

    def test_tiled_matches_untiled(self, setup):
        cfg, model, params, memory, packed, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3)
        ctx = memory[:, 0, :]
        ref_t, ref_s = pallas_full_beam_decode(packed, ctx, 3, dcfg, interpret=True)
        got_t, got_s = pallas_full_beam_decode(
            packed, ctx, 3, dcfg, interpret=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=1e-5)

    def test_length_penalty_path(self, setup):
        cfg, model, params, memory, packed, V = setup
        dcfg = DecodeConfig(
            max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=4, length_penalty=0.7
        )
        ref_tokens, _ = _scan_beam(cfg, model, params, memory, 4, dcfg)
        got_tokens, _ = pallas_full_beam_decode(
            packed, memory[:, 0, :], 4, dcfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(got_tokens))

    def test_early_exit_matches(self, setup):
        cfg, model, params, memory, packed, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3)
        ctx = memory[:, 0, :]
        ref_t, ref_s = pallas_full_beam_decode(packed, ctx, 3, dcfg, interpret=True)
        got_t, got_s = pallas_full_beam_decode(
            packed, ctx, 3, dcfg, interpret=True, early_exit=True
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=1e-5)
