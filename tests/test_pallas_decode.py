"""Fused Pallas decode kernel: parity with the flax decode path.

Runs in Pallas interpreter mode on CPU (the kernel itself is TPU-targeted;
interpret=True executes the same program semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.decoding.decode import DecodeConfig, greedy_sample_decode
from img2latex_tpu.models.seq2seq import Seq2SeqModel, build_model, init_decoder_carry
from img2latex_tpu.ops.pallas.decode_step import (
    fused_decode_step,
    pack_decoder_weights,
    pallas_greedy_decode,
    vmem_bytes_estimate,
)


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
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 64, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, jnp.zeros((8, 10), jnp.int32))
    memory = model.apply(params, imgs, method=Seq2SeqModel.encode)
    packed = pack_decoder_weights(params, V, dtype=jnp.float32)
    return cfg, model, params, memory, packed, V


class TestPacking:
    def test_shapes_padded(self, setup):
        _, _, _, _, packed, V = setup
        assert packed["vocab"] == V
        assert packed["vocab_padded"] == 128
        assert packed["emb"].shape == (128, 128)
        assert packed["w_out"].shape == (128, 128)
        assert packed["num_layers"] == 2
        # padded vocab columns must be unreachable for argmax
        assert float(packed["b_out"][V]) < -1e20

    def test_vmem_estimate_positive(self, setup):
        _, _, _, _, packed, _ = setup
        assert vmem_bytes_estimate(packed, 8) > 0


class TestKernelParity:
    def test_single_step_matches_flax(self, setup):
        cfg, model, params, memory, packed, V = setup
        B = memory.shape[0]
        step = fused_decode_step(packed, interpret=True)
        carry = init_decoder_carry(2, B, 128)
        tokens = jnp.full((B,), 1, jnp.int32)
        # flax reference step
        ref_logits, ref_carry = model.apply(
            params, memory, tokens, carry, method=Seq2SeqModel.decode_step
        )
        got_tok, got_h, got_c = step(tokens, memory[:, 0, :], carry[0], carry[1])
        np.testing.assert_array_equal(
            np.asarray(got_tok), np.asarray(jnp.argmax(ref_logits, -1))
        )
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_carry[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_carry[1]), atol=1e-4)

    def test_full_decode_matches_scan_path(self, setup):
        cfg, model, params, memory, packed, V = setup
        B = memory.shape[0]

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        dcfg = DecodeConfig(max_length=20, start_id=1, end_id=2, pad_id=0)
        ref = greedy_sample_decode(step_fn, init_decoder_carry(2, B, 128), B, dcfg)
        got = pallas_greedy_decode(packed, memory[:, 0, :], 20, 1, 2, 0, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestFullLoopKernel:
    def test_full_loop_matches_scan_path(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        cfg, model, params, memory, packed, V = setup
        B = memory.shape[0]

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        dcfg = DecodeConfig(max_length=20, start_id=1, end_id=2, pad_id=0)
        ref = greedy_sample_decode(step_fn, init_decoder_carry(2, B, 128), B, dcfg)
        got = pallas_full_greedy_decode(packed, memory[:, 0, :], 20, 1, 2, 0, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_batch_tiling_matches_single_shot(self, setup):
        """Batches above batch_tile split into lax.map chunks (with padding
        when B is not a multiple); outputs must match the untiled kernel."""
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        cfg, model, params, memory, packed, V = setup
        B = memory.shape[0]  # 8 -> tile 3 gives chunks [3, 3, 2(padded)]
        ctx = memory[:, 0, :]
        ref = pallas_full_greedy_decode(packed, ctx, 20, 1, 2, 0, interpret=True)
        got = pallas_full_greedy_decode(
            packed, ctx, 20, 1, 2, 0, interpret=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_early_exit_matches_full_loop(self, setup):
        """early_exit=True (in-kernel all-finished while_loop bailout) is
        output-identical to the fixed-length loop, incl. under batch tiling."""
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        ref = pallas_full_greedy_decode(packed, ctx, 20, 1, 2, 0, interpret=True)
        got = pallas_full_greedy_decode(
            packed, ctx, 20, 1, 2, 0, interpret=True, early_exit=True
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        tiled = pallas_full_greedy_decode(
            packed, ctx, 20, 1, 2, 0, interpret=True, early_exit=True, batch_tile=3
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(tiled))

    def test_early_exit_pads_after_all_finished(self, setup):
        """When every row finishes early the remaining steps emit PAD rows
        (the while_loop never stores them; the prefill supplies PAD)."""
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        cfg, model, params, memory, packed, V = setup
        # Force END immediately: bias column end_id=2 to +inf-ish.
        import jax.numpy as jnp

        b_out = np.asarray(packed["b_out"]).copy()
        b_out[2] = 1e30
        forced = dict(packed)
        forced["b_out"] = jnp.asarray(b_out)
        got = pallas_full_greedy_decode(
            forced, memory[:, 0, :], 20, 1, 2, 0, interpret=True, early_exit=True
        )
        arr = np.asarray(got)
        assert (arr[:, 0] == 2).all()  # END first step
        assert (arr[:, 1:] == 0).all()  # PAD tail


class TestGreedyScores:
    """return_scores: the kernel's per-sequence sum of chosen-token log-probs
    (the selective-beam confidence) must match the scan oracle exactly at
    f32, including under batch tiling and early_exit."""

    def _oracle(self, setup, T=20, signal="logp"):
        cfg, model, params, memory, packed, V = setup
        B = memory.shape[0]

        def step_fn(tokens, carry):
            return model.apply(params, memory, tokens, carry, method=Seq2SeqModel.decode_step)

        dcfg = DecodeConfig(
            max_length=T, start_id=1, end_id=2, pad_id=0, selective_signal=signal
        )
        return greedy_sample_decode(
            step_fn, init_decoder_carry(2, B, 128), B, dcfg, return_scores=True
        )

    @pytest.mark.parametrize("signal", ["logp", "margin", "entropy", "margin_logp", "margin_logp:0.5"])
    def test_scores_match_scan_oracle(self, setup, signal):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        _, _, _, memory, packed, _ = setup
        ref_tokens, ref_scores = self._oracle(setup, signal=signal)
        got_tokens, got_scores = pallas_full_greedy_decode(
            packed, memory[:, 0, :], 20, 1, 2, 0, interpret=True,
            return_scores=True, signal=signal,
        )
        np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(got_tokens))
        np.testing.assert_allclose(
            np.asarray(ref_scores), np.asarray(got_scores), atol=1e-4
        )
        if signal == "logp":
            assert np.all(np.asarray(got_scores) <= 0.0)  # log-probs
        elif signal == "margin":
            assert np.all(np.asarray(got_scores) >= 0.0)  # top1-top2 gaps

    def test_scores_under_tiling_and_early_exit(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_greedy_decode

        _, _, _, memory, packed, _ = setup
        ctx = memory[:, 0, :]
        ref_t, ref_s = pallas_full_greedy_decode(
            packed, ctx, 20, 1, 2, 0, interpret=True, return_scores=True
        )
        for kw in ({"batch_tile": 3}, {"early_exit": True},
                   {"batch_tile": 3, "early_exit": True}):
            got_t, got_s = pallas_full_greedy_decode(
                packed, ctx, 20, 1, 2, 0, interpret=True, return_scores=True, **kw
            )
            np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
            np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), atol=1e-5)


class TestFullSampleKernel:
    """Whole-decode sampling kernel (temperature + top-k + Gumbel-max)."""

    def test_top_k_1_equals_greedy(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import (
            pallas_full_greedy_decode,
            pallas_full_sample_decode,
        )

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        s = pallas_full_sample_decode(
            packed, ctx, 16, 1, 2, 0, top_k=1, seed=7, interpret=True
        )
        g = pallas_full_greedy_decode(packed, ctx, 16, 1, 2, 0, interpret=True)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(g))

    def test_support_and_pad_absorption(self, setup):
        """Every sampled token is inside the step's top-k logit set, and
        finished rows emit PAD forever (oracle replay through the flax
        decode_step)."""
        from img2latex_tpu.models.seq2seq import init_decoder_carry
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        K, T = 4, 16
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, T, 1, 2, 0, top_k=K, seed=123, interpret=True
            )
        )
        B = ctx.shape[0]
        carry = init_decoder_carry(2, B, 128)
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

    def test_seed_changes_draws_and_tiling_runs(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        a = np.asarray(
            pallas_full_sample_decode(packed, ctx, 16, 1, 2, 0, top_k=4, seed=1, interpret=True)
        )
        b = np.asarray(
            pallas_full_sample_decode(packed, ctx, 16, 1, 2, 0, top_k=4, seed=2, interpret=True)
        )
        assert not np.array_equal(a, b)
        big = pallas_full_sample_decode(
            jax.tree.map(lambda x: x, packed),
            jnp.concatenate([ctx] * 4, axis=0),
            16, 1, 2, 0, top_k=4, seed=3, interpret=True, batch_tile=8,
        )
        assert big.shape == (ctx.shape[0] * 4, 16)

    def test_first_token_distribution_matches_topk_softmax(self, setup):
        """Empirical first-token frequencies over many rows with a shared
        context match the renormalized top-k softmax (Gumbel-max is an
        exact categorical sampler; tolerance is statistical)."""
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode
        from img2latex_tpu.models.seq2seq import init_decoder_carry

        cfg, model, params, memory, packed, V = setup
        N, K = 1024, 3
        ctx = jnp.broadcast_to(memory[:1, 0, :], (N, memory.shape[-1]))
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, 1, 1, 2, 0, top_k=K, seed=77, interpret=True
            )
        )[:, 0]
        carry = init_decoder_carry(2, 1, 128)
        logits, _ = model.apply(
            params, memory[:1], jnp.full((1,), 1, jnp.int32), carry,
            method=Seq2SeqModel.decode_step,
        )
        lg = np.asarray(logits)[0]
        kth = np.sort(lg)[-K]
        keep = lg >= kth - 1e-7
        p = np.where(keep, np.exp(lg - lg.max()), 0.0)
        p = p / p.sum()
        for tok in np.nonzero(keep)[0]:
            emp = float(np.mean(s == tok))
            assert abs(emp - p[tok]) < 0.06, (tok, emp, p[tok])
        assert np.isin(s, np.nonzero(keep)[0]).all()

    def test_early_exit_shape_and_pads(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, 16, 1, 2, 0, top_k=4, seed=5, interpret=True, early_exit=True
            )
        )
        assert s.shape == (ctx.shape[0], 16)
        for row in s:
            ends = np.nonzero(row == 2)[0]
            if len(ends):
                assert (row[ends[0] + 1 :] == 0).all()


class TestTopPSampleKernel:
    """In-kernel nucleus (top-p) sampling: the sort-free iterative extraction
    must reproduce ``decode.filter_top_p``'s kept set exactly."""

    def _replay_support(self, setup, s, top_k, top_p, T):
        """Oracle: replay the flax decode_step along the kernel's own token
        path; every sampled token must be in the nonzero support of the scan
        path's filter chain (``decode._next_token_probs`` — softmax ->
        top-k -> renormalize -> top-p, the reference composition)."""
        from img2latex_tpu.decoding.decode import _next_token_probs

        cfg, model, params, memory, packed, V = setup
        fcfg = DecodeConfig(top_k=top_k, top_p=top_p)
        B = memory.shape[0]
        carry = init_decoder_carry(2, B, 128)
        toks = jnp.full((B,), 1, jnp.int32)
        finished = np.zeros(B, bool)
        for t in range(T):
            logits, carry = model.apply(
                params, memory, toks, carry, method=Seq2SeqModel.decode_step
            )
            kept = np.asarray(_next_token_probs(logits, fcfg)) > 0
            for b in range(B):
                if finished[b]:
                    assert s[b, t] == 0
                else:
                    assert kept[b, s[b, t]], (b, t, s[b, t])
            finished |= s[:, t] == 2
            toks = jnp.asarray(np.where(finished, 0, s[:, t]).astype(np.int32))

    def test_topp_support_and_pad_absorption(self, setup):
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        T = 16
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, T, 1, 2, 0, top_k=0, top_p=0.9, seed=31, interpret=True
            )
        )
        self._replay_support(setup, s, 0, 0.9, T)

    def test_topk_topp_composed_support(self, setup):
        """top-k and top-p compose (reference order: k first, then nucleus
        over the k survivors' original-scale probs)."""
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        T = 12
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, T, 1, 2, 0, top_k=8, top_p=0.6, seed=57, interpret=True
            )
        )
        self._replay_support(setup, s, 8, 0.6, T)

    def test_tiny_p_equals_greedy(self, setup):
        """p below the max prob keeps only the argmax token -> greedy."""
        from img2latex_tpu.ops.pallas.decode_step import (
            pallas_full_greedy_decode,
            pallas_full_sample_decode,
        )

        cfg, model, params, memory, packed, V = setup
        ctx = memory[:, 0, :]
        s = pallas_full_sample_decode(
            packed, ctx, 16, 1, 2, 0, top_k=0, top_p=1e-6, seed=9, interpret=True
        )
        g = pallas_full_greedy_decode(packed, ctx, 16, 1, 2, 0, interpret=True)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(g))

    def test_first_token_distribution_matches_nucleus_softmax(self, setup):
        """Empirical first-token frequencies match the renormalized nucleus
        distribution (Gumbel-max over log kept probs is exact)."""
        from img2latex_tpu.decoding.decode import filter_top_p
        from img2latex_tpu.ops.pallas.decode_step import pallas_full_sample_decode

        cfg, model, params, memory, packed, V = setup
        N, P = 1024, 0.7
        ctx = jnp.broadcast_to(memory[:1, 0, :], (N, memory.shape[-1]))
        s = np.asarray(
            pallas_full_sample_decode(
                packed, ctx, 1, 1, 2, 0, top_k=0, top_p=P, seed=101, interpret=True
            )
        )[:, 0]
        carry = init_decoder_carry(2, 1, 128)
        logits, _ = model.apply(
            params, memory[:1], jnp.full((1,), 1, jnp.int32), carry,
            method=Seq2SeqModel.decode_step,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        p = np.asarray(filter_top_p(probs, P))[0]
        p = p / p.sum()
        keep_idx = np.nonzero(p > 0)[0]
        assert np.isin(s, keep_idx).all()
        for tok in keep_idx:
            emp = float(np.mean(s == tok))
            assert abs(emp - p[tok]) < 0.06, (tok, emp, p[tok])
