"""Grid-memory whole-decode Pallas kernels: parity with the flax scan path.

Interpret mode on CPU, f32 — the kernel's attention algebra (split matmul +
precomputed memory projection) must reproduce the scan path's decodes
exactly at f32 (tests mirror tests/test_pallas_decode.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.decoding.decode import DecodeConfig, beam_decode, greedy_sample_decode
from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model, init_decoder_carry
from img2latex_tpu.ops.pallas.decode_step import pack_decoder_weights
from img2latex_tpu.ops.pallas.grid_decode import (
    grid_beam_vmem_bytes_estimate,
    grid_memory_proj,
    grid_vmem_bytes_estimate,
    pack_attention_weights,
    pallas_full_grid_beam_decode,
    pallas_full_grid_greedy_decode,
    pallas_full_grid_sample_decode,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    cfg.model.memory = "grid"
    cfg.model.embedding_dim = 64
    cfg.model.decoder.hidden_dim = 96  # != embed: exercises non-square attn
    cfg.model.decoder.lstm_layers = 2
    cfg.model.decoder.dropout = 0.0
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 64
    cfg.model.encoder.cnn.conv_filters = [4, 8]
    cfg.hardware.compute_dtype = "float32"
    V = 50
    model = build_model(cfg, V)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 64, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, jnp.zeros((8, 10), jnp.int32))
    memory = model.apply(params, imgs, method=Seq2SeqModel.encode)
    assert memory.shape[1] > 1, "grid mode must emit S > 1 memory slots"
    packed = pack_decoder_weights(params, V, dtype=jnp.float32)
    att = pack_attention_weights(params, dtype=jnp.float32)
    return cfg, model, params, memory, packed, att, V


class TestAttentionPacking:
    def test_shapes(self, setup):
        cfg, _, _, memory, packed, att, _ = setup
        H = cfg.model.decoder.hidden_dim
        E = cfg.model.embedding_dim
        assert att["w_h"].shape == (H, H)
        assert att["w_m"].shape == (E, H)
        assert att["v"].shape == (1, H)
        assert att["hidden_dim"] == H and att["mem_dim"] == E

    def test_memory_proj_matches_dense_split(self, setup):
        """U = mem @ W_m + b equals the attn Dense applied to [0; mem]."""
        cfg, model, params, memory, packed, att, _ = setup
        u = grid_memory_proj(att, memory)
        kern = params["params"]["decoder"]["cell"]["attention"]["attn"]["kernel"]
        bias = params["params"]["decoder"]["cell"]["attention"]["attn"]["bias"]
        H = cfg.model.decoder.hidden_dim
        ref = jnp.einsum("bse,ea->bsa", memory, kern[H:]) + bias
        np.testing.assert_allclose(np.asarray(u), np.asarray(ref), atol=1e-5)

    def test_vmem_estimate_positive(self, setup):
        _, _, _, memory, packed, att, _ = setup
        assert grid_vmem_bytes_estimate(packed, att, 8, memory.shape[1]) > 0

    def test_auto_tile_capped_at_batch(self, setup):
        """Small batches must not pad up to a full VMEM-budget tile (a B=1
        predict would otherwise decode 100+ zero-memory rows for max_length
        steps and defeat early_exit's all-finished bailout)."""
        from img2latex_tpu.ops.pallas.grid_decode import _auto_tile, _auto_tile_beam

        _, _, _, memory, packed, att, _ = setup
        S = memory.shape[1]
        assert _auto_tile(packed, att, S, batch=1) == 8
        assert _auto_tile(packed, att, S, batch=20) <= 24
        assert _auto_tile(packed, att, S, batch=0) >= _auto_tile(packed, att, S, batch=64)
        assert _auto_tile_beam(packed, att, S, 5, batch=1) == 8


class TestGridGreedyKernel:
    def _scan_ref(self, model, params, memory, dcfg, layers, B, hidden):
        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        return greedy_sample_decode(
            step_fn, init_decoder_carry(layers, B, hidden), B, dcfg
        )

    def test_matches_scan_path(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        B = memory.shape[0]
        dcfg = DecodeConfig(max_length=20, start_id=1, end_id=2, pad_id=0)
        ref = self._scan_ref(
            model, params, memory, dcfg, 2, B, cfg.model.decoder.hidden_dim
        )
        got = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_batch_tiling_matches_single_shot(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        ref = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True
        )
        got = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_early_exit_matches_full_loop(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        ref = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True
        )
        got = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True, early_exit=True
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        tiled = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True, early_exit=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(tiled))


class TestGridGreedyScores:
    @pytest.mark.parametrize("signal", ["logp", "margin", "entropy", "margin_logp", "margin_logp:0.5"])
    def test_scores_match_scan_oracle(self, setup, signal):
        """Kernel confidence (per-step logp/margin/entropy sums) == scan
        oracle at f32, incl. under tiling + early_exit (selective-beam
        signal)."""
        cfg, model, params, memory, packed, att, V = setup
        B = memory.shape[0]
        dcfg = DecodeConfig(
            max_length=20, start_id=1, end_id=2, pad_id=0, selective_signal=signal
        )

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        ref_t, ref_s = greedy_sample_decode(
            step_fn,
            init_decoder_carry(2, B, cfg.model.decoder.hidden_dim),
            B, dcfg, return_scores=True,
        )
        got_t, got_s = pallas_full_grid_greedy_decode(
            packed, att, memory, 20, 1, 2, 0, interpret=True,
            return_scores=True, signal=signal,
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), atol=1e-4)
        for kw in ({"batch_tile": 3}, {"early_exit": True}):
            t2, s2 = pallas_full_grid_greedy_decode(
                packed, att, memory, 20, 1, 2, 0, interpret=True,
                return_scores=True, signal=signal, **kw,
            )
            np.testing.assert_array_equal(np.asarray(got_t), np.asarray(t2))
            np.testing.assert_allclose(np.asarray(got_s), np.asarray(s2), atol=1e-5)


class TestGridBeamKernel:
    def _scan_beam(self, cfg, model, params, memory, K, dcfg):
        B = memory.shape[0]
        mem_exp = jnp.repeat(memory, K, axis=0)

        def step_fn(tokens, carry):
            return model.apply(
                params, mem_exp, tokens, carry, method=Seq2SeqModel.decode_step
            )

        carry0 = init_decoder_carry(
            cfg.model.decoder.lstm_layers, B * K, cfg.model.decoder.hidden_dim
        )
        return beam_decode(step_fn, carry0, B, K, dcfg)

    @pytest.mark.parametrize("K", [2, 5])
    def test_matches_scan_beam(self, setup, K):
        cfg, model, params, memory, packed, att, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=K)
        ref_t, ref_s = self._scan_beam(cfg, model, params, memory, K, dcfg)
        got_t, got_s = pallas_full_grid_beam_decode(
            packed, att, memory, K, dcfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(
            np.asarray(ref_s), np.asarray(got_s), rtol=1e-5, atol=1e-5
        )

    def test_tiled_matches_untiled(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3)
        ref_t, ref_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True
        )
        got_t, got_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=1e-5)

    def test_grouped_tile_map_matches_untiled(self, setup, monkeypatch):
        """Multi-group tile map (the scoped-VMEM workaround): B=8/tile=3 gives
        nc=3 tiles; group=2 exercises a 2-tile lax.map group, the trailing
        singleton group, and the HBM concat between them."""
        cfg, model, params, memory, packed, att, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3)
        ref_t, ref_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True
        )
        monkeypatch.setenv("IMG2LATEX_BEAM_MAP_GROUP", "2")
        got_t, got_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=1e-5)

    def test_early_exit_matches_full_loop(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        dcfg = DecodeConfig(max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3)
        ref_t, ref_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True
        )
        got_t, got_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True, early_exit=True
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), rtol=1e-5)

    def test_length_penalty_path(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        dcfg = DecodeConfig(
            max_length=16, start_id=1, end_id=2, pad_id=0, beam_size=3, length_penalty=1.5
        )
        ref_t, ref_s = self._scan_beam(cfg, model, params, memory, 3, dcfg)
        got_t, got_s = pallas_full_grid_beam_decode(
            packed, att, memory, 3, dcfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(
            np.asarray(ref_s), np.asarray(got_s), rtol=1e-5, atol=1e-5
        )

    def test_vmem_estimate_positive(self, setup):
        _, _, _, memory, packed, att, _ = setup
        assert grid_beam_vmem_bytes_estimate(packed, att, 8, memory.shape[1], 5) > 0


class TestGridSampleKernel:
    def test_top_k_1_equals_greedy(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        s = pallas_full_grid_sample_decode(
            packed, att, memory, 16, 1, 2, 0, top_k=1, seed=7, interpret=True
        )
        g = pallas_full_grid_greedy_decode(packed, att, memory, 16, 1, 2, 0, interpret=True)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(g))

    def test_support_and_pad_absorption(self, setup):
        """Sampled tokens stay inside each step's top-k set (oracle replay
        through the flax decode_step); finished rows emit PAD forever."""
        cfg, model, params, memory, packed, att, V = setup
        K, T = 4, 16
        s = np.asarray(
            pallas_full_grid_sample_decode(
                packed, att, memory, T, 1, 2, 0, top_k=K, seed=123, interpret=True
            )
        )
        B = memory.shape[0]
        carry = init_decoder_carry(2, B, cfg.model.decoder.hidden_dim)
        toks = jnp.full((B,), 1, jnp.int32)
        finished = np.zeros(B, bool)
        for t in range(T):
            logits, carry = model.apply(
                params, memory, toks, carry, method=Seq2SeqModel.decode_step
            )
            lg = np.asarray(logits)
            kth = np.sort(lg, axis=-1)[:, -K]
            for b in range(B):
                if finished[b]:
                    assert s[b, t] == 0
                else:
                    assert lg[b, s[b, t]] >= kth[b] - 1e-5
            finished |= s[:, t] == 2
            toks = jnp.asarray(np.where(finished, 0, s[:, t]).astype(np.int32))

    def test_topp_support_and_pad_absorption(self, setup):
        """Nucleus sampling in the grid kernel: sampled tokens stay inside
        the scan filter chain's nonzero support (softmax -> filter_top_p),
        finished rows emit PAD forever."""
        from img2latex_tpu.decoding.decode import filter_top_p

        cfg, model, params, memory, packed, att, V = setup
        P, T = 0.85, 16
        s = np.asarray(
            pallas_full_grid_sample_decode(
                packed, att, memory, T, 1, 2, 0, top_k=0, top_p=P, seed=211, interpret=True
            )
        )
        B = memory.shape[0]
        carry = init_decoder_carry(2, B, cfg.model.decoder.hidden_dim)
        toks = jnp.full((B,), 1, jnp.int32)
        finished = np.zeros(B, bool)
        for t in range(T):
            logits, carry = model.apply(
                params, memory, toks, carry, method=Seq2SeqModel.decode_step
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            kept = np.asarray(filter_top_p(probs, P)) > 0
            for b in range(B):
                if finished[b]:
                    assert s[b, t] == 0
                else:
                    assert kept[b, s[b, t]], (b, t, s[b, t])
            finished |= s[:, t] == 2
            toks = jnp.asarray(np.where(finished, 0, s[:, t]).astype(np.int32))

    def test_seed_changes_draws_and_tiling_runs(self, setup):
        cfg, model, params, memory, packed, att, V = setup
        a = np.asarray(
            pallas_full_grid_sample_decode(
                packed, att, memory, 16, 1, 2, 0, top_k=4, seed=1, interpret=True
            )
        )
        b = np.asarray(
            pallas_full_grid_sample_decode(
                packed, att, memory, 16, 1, 2, 0, top_k=4, seed=2, interpret=True
            )
        )
        assert not np.array_equal(a, b)
        tiled = np.asarray(
            pallas_full_grid_sample_decode(
                packed, att, memory, 16, 1, 2, 0, top_k=4, seed=1, interpret=True, batch_tile=3
            )
        )
        assert tiled.shape == a.shape
