import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.decoding.decode import (
    DecodeConfig,
    beam_decode,
    filter_top_k,
    filter_top_p,
    greedy_sample_decode,
    trim_host,
)

V, H = 8, 5
PAD, START, END = 0, 1, 2


def make_dynamics(seed=0):
    """Tiny deterministic RNN dynamics shared by jax and numpy oracles.

    PAD is made very improbable (as in any trained model) because the
    on-device beam reserves PAD as the END-absorbing filler token.
    """
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(V, H)).astype(np.float32)
    W = rng.normal(size=(H, V)).astype(np.float32)
    return emb, W


_PAD_BIAS = np.zeros(V, np.float32)
_PAD_BIAS[PAD] = -50.0


def jax_step_fn(emb, W):
    emb_j, W_j, bias = jnp.array(emb), jnp.array(W), jnp.array(_PAD_BIAS)

    def step(tokens, carry):
        carry = jnp.tanh(carry + emb_j[tokens])
        return carry @ W_j + bias, carry

    return step


def np_step(emb, W, token, carry):
    carry = np.tanh(carry + emb[token])
    return carry @ W + _PAD_BIAS, carry


class TestGreedy:
    def test_matches_numpy_oracle(self):
        emb, W = make_dynamics()
        B, T = 3, 10
        cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD)
        carry0 = jnp.zeros((B, H))
        tokens = greedy_sample_decode(jax_step_fn(emb, W), carry0, B, cfg)
        assert tokens.shape == (B, T)

        # numpy oracle: argmax loop with END -> PAD forever
        out = np.zeros((B, T), dtype=np.int64)
        carry = np.zeros((B, H), dtype=np.float32)
        tok = np.full((B,), START)
        finished = np.zeros(B, dtype=bool)
        for t in range(T):
            logits, carry = np_step(emb, W, tok, carry)
            nxt = logits.argmax(-1)
            nxt = np.where(finished, PAD, nxt)
            finished |= nxt == END
            out[:, t] = nxt
            tok = nxt
        np.testing.assert_array_equal(np.asarray(tokens), out)

    def test_finished_emits_pad_forever(self):
        # dynamics rigged so END is emitted at step 2 for everything
        emb, W = make_dynamics(1)
        W = W.copy()
        W[:, END] = 100.0  # END always wins
        cfg = DecodeConfig(max_length=6, start_id=START, end_id=END, pad_id=PAD)
        tokens = np.asarray(
            greedy_sample_decode(jax_step_fn(emb, W), jnp.zeros((2, H)), 2, cfg)
        )
        assert (tokens[:, 0] == END).all()
        assert (tokens[:, 1:] == PAD).all()

    def test_early_exit_matches_scan(self):
        # Dynamics where END wins quickly for every row -> the while_loop
        # stops early; outputs must equal the fixed-length scan bit-for-bit.
        emb, W = make_dynamics(3)
        W = W.copy()
        W[:, END] += 3.0  # END likely but not immediate
        B, T = 4, 20
        for kwargs in ({}, {"top_k": 3}):  # greedy and sampling
            cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, **kwargs)
            cfg_ee = DecodeConfig(
                max_length=T, start_id=START, end_id=END, pad_id=PAD, early_exit=True, **kwargs
            )
            rng = jax.random.PRNGKey(7)
            a = greedy_sample_decode(jax_step_fn(emb, W), jnp.zeros((B, H)), B, cfg, rng=rng)
            b = greedy_sample_decode(jax_step_fn(emb, W), jnp.zeros((B, H)), B, cfg_ee, rng=rng)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # sanity: sequences actually finished early (END present per row)
            assert (np.asarray(a) == END).any(axis=1).all()

    def test_early_exit_never_finishing(self):
        # PAD/END suppressed -> loop must run the full max_length.
        emb, W = make_dynamics(4)
        emb_j, W_j = jnp.array(emb), jnp.array(W)
        bias = jnp.where(jnp.arange(V) == 3, 50.0, 0.0)  # token 3 always argmaxes

        def step(tokens, carry):
            carry = jnp.tanh(carry + emb_j[tokens])
            return carry @ W_j + bias, carry

        cfg = DecodeConfig(max_length=9, start_id=START, end_id=END, pad_id=PAD, early_exit=True)
        cfg_scan = DecodeConfig(max_length=9, start_id=START, end_id=END, pad_id=PAD)
        a = greedy_sample_decode(step, jnp.zeros((2, H)), 2, cfg)
        b = greedy_sample_decode(step, jnp.zeros((2, H)), 2, cfg_scan)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not (np.asarray(a) == END).any()

    def test_jittable_with_static_config(self):
        emb, W = make_dynamics()
        cfg = DecodeConfig(max_length=5, start_id=START, end_id=END, pad_id=PAD)
        fn = jax.jit(
            lambda c0: greedy_sample_decode(jax_step_fn(emb, W), c0, 2, cfg)
        )
        out = fn(jnp.zeros((2, H)))
        assert out.shape == (2, 5)


class TestFilters:
    def test_top_k_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        probs = rng.dirichlet(np.ones(V), size=4).astype(np.float32)
        for k in (1, 3, V):
            ours = np.asarray(filter_top_k(jnp.array(probs), k))
            tp = torch.tensor(probs.copy())
            kth = torch.topk(tp, min(k, V), dim=-1)[0][:, -1, None]
            tp[tp < kth] = 0.0
            np.testing.assert_allclose(ours, tp.numpy(), atol=1e-7)

    def test_top_p_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        probs = rng.dirichlet(np.ones(V), size=6).astype(np.float32)
        for p in (0.1, 0.5, 0.9):
            ours = np.asarray(filter_top_p(jnp.array(probs), p))
            tp = torch.tensor(probs.copy())
            sorted_probs, sorted_idx = torch.sort(tp, descending=True)
            cum = torch.cumsum(sorted_probs, dim=-1)
            remove = cum > p
            remove[:, 1:] = remove[:, :-1].clone()
            remove[:, 0] = False
            orig_remove = remove.scatter(-1, sorted_idx, remove)
            tp[orig_remove] = 0.0
            np.testing.assert_allclose(ours, tp.numpy(), atol=1e-7)

    def test_composed_filters_match_reference_chain(self):
        """top-k THEN top-p composes with a renormalization in between
        (reference predictor.py:294-335: probs /= probs.sum() right after
        the top-k zeroing, so the nucleus mass is measured over the
        renormalized top-k survivors)."""
        torch = pytest.importorskip("torch")
        from img2latex_tpu.decoding.decode import DecodeConfig, _next_token_probs

        rng = np.random.default_rng(2)
        logits = rng.normal(size=(6, V)).astype(np.float32) * 3.0
        for k, p in ((3, 0.5), (5, 0.9), (8, 0.3)):
            ours = np.asarray(
                _next_token_probs(jnp.array(logits), DecodeConfig(top_k=k, top_p=p))
            )
            tl = torch.tensor(logits.copy())
            tp = torch.softmax(tl, dim=-1)
            kth = torch.topk(tp, k, dim=-1)[0][:, -1, None]
            tp[tp < kth] = 0.0
            tp = tp / tp.sum(dim=-1, keepdim=True)  # reference renorm
            sorted_probs, sorted_idx = torch.sort(tp, descending=True)
            cum = torch.cumsum(sorted_probs, dim=-1)
            remove = cum > p
            remove[:, 1:] = remove[:, :-1].clone()
            remove[:, 0] = False
            orig_remove = remove.scatter(-1, sorted_idx, remove)
            tp[orig_remove] = 0.0
            tp = tp / tp.sum(dim=-1, keepdim=True)
            np.testing.assert_allclose(ours, tp.numpy(), atol=1e-6)

    def test_top_k_1_sampling_equals_greedy(self):
        emb, W = make_dynamics(2)
        B, T = 2, 8
        greedy = greedy_sample_decode(
            jax_step_fn(emb, W),
            jnp.zeros((B, H)),
            B,
            DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD),
        )
        sampled = greedy_sample_decode(
            jax_step_fn(emb, W),
            jnp.zeros((B, H)),
            B,
            DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, top_k=1),
            rng=jax.random.PRNGKey(9),
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))

    def test_top_k_sampling_stays_in_top_k(self):
        emb, W = make_dynamics(3)
        B, T, k = 2, 10, 3
        cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, top_k=k)
        tokens = np.asarray(
            greedy_sample_decode(
                jax_step_fn(emb, W), jnp.zeros((B, H)), B, cfg, rng=jax.random.PRNGKey(4)
            )
        )
        # replay: at each step the emitted token must be among top-k (or PAD
        # after finish)
        carry = np.zeros((B, H), dtype=np.float32)
        tok = np.full((B,), START)
        finished = np.zeros(B, dtype=bool)
        for t in range(T):
            logits, carry = np_step(emb, W, tok, carry)
            topk = np.argsort(-logits, axis=-1)[:, :k]
            for b in range(B):
                if finished[b]:
                    assert tokens[b, t] == PAD
                else:
                    assert tokens[b, t] in topk[b]
            finished |= tokens[:, t] == END
            tok = tokens[:, t]

    def test_temperature_alone_is_argmax(self):
        emb, W = make_dynamics(4)
        cfg_hot = DecodeConfig(max_length=6, start_id=START, end_id=END, pad_id=PAD, temperature=5.0)
        cfg_std = DecodeConfig(max_length=6, start_id=START, end_id=END, pad_id=PAD)
        a = greedy_sample_decode(jax_step_fn(emb, W), jnp.zeros((2, H)), 2, cfg_hot)
        b = greedy_sample_decode(jax_step_fn(emb, W), jnp.zeros((2, H)), 2, cfg_std)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def np_reference_beam(emb, W, K, T):
    """Reference-style dict beam search (seq2seq.py:234-298) in numpy, B=1."""
    beams = [{"tokens": [START], "carry": np.zeros(H, np.float32), "score": 0.0}]
    completed = []
    for _ in range(T):
        candidates = []
        for beam in beams:
            last = beam["tokens"][-1]
            if last == END:
                completed.append(beam)
                continue
            logits, carry = np_step(emb, W, np.array([last]), beam["carry"][None])
            logits, carry = logits[0], carry[0]
            logp = logits - (np.log(np.exp(logits - logits.max()).sum()) + logits.max())
            top = np.argsort(-logp)[:K]
            for idx in top:
                candidates.append(
                    {
                        "tokens": beam["tokens"] + [int(idx)],
                        "carry": carry,
                        "score": beam["score"] + float(logp[idx]),
                    }
                )
        if not candidates:
            break
        candidates.sort(key=lambda b: b["score"], reverse=True)
        beams = candidates[:K]
        if all(b["tokens"][-1] == END for b in beams):
            completed.extend(beams)
            break
    best = max(completed, key=lambda b: b["score"]) if completed else beams[0]
    seq = best["tokens"][1:]
    if END in seq:
        seq = seq[: seq.index(END)]
    return seq, best["score"]


class TestBeam:
    def _run_beam(self, emb, W, B, K, T):
        step = jax_step_fn(emb, W)
        carry0 = jnp.zeros((B * K, H))
        cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, beam_size=K)
        return beam_decode(step, carry0, B, K, cfg)

    def test_beam_1_equals_greedy(self):
        emb, W = make_dynamics(5)
        B, T = 3, 9
        tokens, scores = self._run_beam(emb, W, B, 1, T)
        greedy = greedy_sample_decode(
            jax_step_fn(emb, W),
            jnp.zeros((B, H)),
            B,
            DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD),
        )
        np.testing.assert_array_equal(np.asarray(tokens), np.asarray(greedy))

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("K", [2, 3])
    def test_beam_matches_reference_dict_beam(self, seed, K):
        emb, W = make_dynamics(seed)
        # bias toward END so sequences finish within T
        W = W.copy()
        W[:, END] += 1.0
        T = 12
        tokens, scores = self._run_beam(emb, W, 1, K, T)
        got = trim_host(np.asarray(tokens), END, PAD)[0]
        ref_seq, ref_score = np_reference_beam(emb, W, K, T)
        assert got == ref_seq
        assert float(scores[0]) == pytest.approx(ref_score, abs=1e-4)

    def test_beam_early_exit_matches_scan(self):
        """early_exit=True (all-finished while_loop bailout) is
        output-identical to the full-length beam scan — incl. when sequences
        finish early (END-biased dynamics) and when they never finish."""
        for seed, end_bias in ((0, 1.5), (1, 0.0)):
            emb, W = make_dynamics(seed)
            W = W.copy()
            W[:, END] += end_bias
            B, K, T = 3, 3, 10
            step = jax_step_fn(emb, W)
            carry0 = jnp.zeros((B * K, H))
            base = dict(max_length=T, start_id=START, end_id=END, pad_id=PAD, beam_size=K)
            ref_t, ref_s = beam_decode(step, carry0, B, K, DecodeConfig(**base))
            got_t, got_s = beam_decode(
                step, carry0, B, K, DecodeConfig(early_exit=True, **base)
            )
            np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
            np.testing.assert_allclose(np.asarray(ref_s), np.asarray(got_s), atol=1e-6)

    def test_length_penalty_scores_are_selection_scores(self):
        """With length_penalty > 0 the returned score is the normalized
        (selection) score, consistent with the beam it picked."""
        emb, W = make_dynamics(2)
        W = W.copy()
        W[:, END] += 1.0
        B, K, T = 2, 3, 10
        step = jax_step_fn(emb, W)
        carry0 = jnp.zeros((B * K, H))
        base = dict(max_length=T, start_id=START, end_id=END, pad_id=PAD, beam_size=K)
        tokens, scores = beam_decode(
            step, carry0, B, K, DecodeConfig(length_penalty=1.0, **base)
        )
        lengths = (np.asarray(tokens) != PAD).sum(axis=-1)
        raw_t, raw_s = beam_decode(step, carry0, B, K, DecodeConfig(**base))
        # when lp selects the same beam as raw, score == raw / len^1
        same = (np.asarray(raw_t) == np.asarray(tokens)).all(axis=-1)
        for b in range(B):
            if same[b]:
                assert float(scores[b]) == pytest.approx(
                    float(raw_s[b]) / max(lengths[b], 1.0), abs=1e-5
                )

    def test_batched_beam_independent_of_batching(self):
        """Each batch element's beam result must match running it alone."""
        emb, W = make_dynamics(6)
        W = W.copy()
        W[:, END] += 0.5
        B, K, T = 3, 2, 8
        step = jax_step_fn(emb, W)
        # different initial carries per element to differentiate them
        rng = np.random.default_rng(0)
        init = rng.normal(size=(B, H)).astype(np.float32)
        carry0 = jnp.repeat(jnp.array(init), K, axis=0)
        cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, beam_size=K)
        tokens, scores = beam_decode(step, carry0, B, K, cfg)
        for b in range(B):
            solo_carry = jnp.repeat(jnp.array(init[b : b + 1]), K, axis=0)
            solo_tokens, solo_scores = beam_decode(step, solo_carry, 1, K, cfg)
            np.testing.assert_array_equal(np.asarray(tokens[b]), np.asarray(solo_tokens[0]))
            assert float(scores[b]) == pytest.approx(float(solo_scores[0]), abs=1e-5)

    def test_length_penalty_prefers_longer(self):
        emb, W = make_dynamics(7)
        B, K, T = 1, 3, 10
        step = jax_step_fn(emb, W)
        carry0 = jnp.zeros((B * K, H))
        t0, _ = beam_decode(
            step, carry0, B, K, DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD)
        )
        t1, _ = beam_decode(
            step,
            carry0,
            B,
            K,
            DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD, length_penalty=1.0),
        )
        # With penalty the selection may differ; both must be valid shapes.
        assert t0.shape == t1.shape == (1, T)


class TestTrim:
    def test_trim_host(self):
        arr = np.array(
            [
                [5, 6, END, PAD, PAD],
                [7, 8, 9, 5, 6],
                [START, 5, END, PAD, PAD],
            ]
        )
        out = trim_host(arr, END, PAD, start_id=START)
        assert out == [[5, 6], [7, 8, 9, 5, 6], [5]]

    def test_trim_host_matches_python_oracle(self):
        """The vectorized trim == the per-row reference semantics (cut at
        first END exclusive, strip ALL pads, strip leading START) on random
        rows including empty/no-END/interior-PAD edge cases."""

        def oracle(tokens, end_id, pad_id, start_id=None):
            out = []
            for row in np.asarray(tokens):
                ids = row.tolist()
                if start_id is not None and ids and ids[0] == start_id:
                    ids = ids[1:]
                if end_id in ids:
                    ids = ids[: ids.index(end_id)]
                out.append([t for t in ids if t != pad_id])
            return out

        rng = np.random.default_rng(7)
        for _ in range(40):
            B, T = int(rng.integers(1, 16)), int(rng.integers(1, 24))
            arr = rng.integers(0, 6, size=(B, T)).astype(np.int32)
            for start in (None, START):
                assert trim_host(arr, END, PAD, start_id=start) == oracle(
                    arr, END, PAD, start_id=start
                )


class TestTopkIterative:
    def test_matches_lax_top_k(self):
        from img2latex_tpu.decoding.decode import topk_iterative

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(7, 40)).astype(np.float32))
        for k in (1, 3, 5):
            v_ref, i_ref = jax.lax.top_k(x, k)
            v, i = topk_iterative(x, k)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))

    def test_tie_break_prefers_lower_index(self):
        from img2latex_tpu.decoding.decode import topk_iterative

        x = jnp.asarray([[1.0, 3.0, 3.0, 2.0]])
        v, i = topk_iterative(x, 3)
        v_ref, i_ref = jax.lax.top_k(x, 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


class TestBeamCarryDtypes:
    def test_bool_and_int_carry_leaves_survive_gather(self):
        # A step_fn whose carry holds a bool flag and an int counter alongside
        # the float state: gather_beams must preserve their dtypes exactly
        # (regression: the one-hot matmul path only applies to float leaves).
        emb, W = make_dynamics(12)
        emb_j, W_j, bias = jnp.array(emb), jnp.array(W), jnp.array(_PAD_BIAS)
        B, K, T = 2, 3, 6

        def step(tokens, carry):
            h, flag, count = carry
            h = jnp.tanh(h + emb_j[tokens])
            return h @ W_j + bias, (h, flag | (tokens == END), count + 1)

        carry0 = (
            jnp.zeros((B * K, H)),
            jnp.zeros((B * K,), bool),
            jnp.zeros((B * K,), jnp.int32),
        )
        cfg = DecodeConfig(max_length=T, start_id=START, end_id=END, pad_id=PAD)
        tokens, scores = beam_decode(step, carry0, B, K, cfg)
        assert tokens.shape == (B, T)
        # same result as a float-only carry (the extra leaves are inert)
        def step_f(tokens, carry):
            h = jnp.tanh(carry + emb_j[tokens])
            return h @ W_j + bias, h

        tokens2, scores2 = beam_decode(step_f, jnp.zeros((B * K, H)), B, K, cfg)
        np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


class TestSelectiveSignals:
    """The three selective-beam confidence gates (DecodeConfig.selective_signal):
    logp / margin / entropy, all 'smaller = less confident' so
    select_uncertain's bottom-k rule is signal-agnostic (VERDICT r2 #4)."""

    def _controlled_step(self):
        """Row 0 decodes with a razor-peaked distribution, row 1 near-uniform:
        every signal must rank row 1 as less confident."""
        peaked = np.full(V, -8.0, np.float32)
        peaked[3] = 8.0
        flat = np.zeros(V, np.float32)
        flat[4] = 0.02  # tiny tilt so argmax is deterministic and not END/PAD
        logits = jnp.stack([jnp.array(peaked), jnp.array(flat)])

        def step(tokens, carry):
            return logits, carry

        return step

    @pytest.mark.parametrize("signal", ["logp", "margin", "entropy", "margin_logp", "margin_logp:0.5"])
    def test_uniform_row_ranks_less_confident(self, signal):
        from img2latex_tpu.decoding.decode import select_uncertain

        cfg = DecodeConfig(
            max_length=6, start_id=START, end_id=END, pad_id=PAD,
            selective_signal=signal,
        )
        tokens, scores = greedy_sample_decode(
            self._controlled_step(), jnp.zeros((2, H)), 2, cfg, return_scores=True
        )
        assert float(scores[1]) < float(scores[0]), signal
        idx = select_uncertain(tokens, scores, 1, PAD)
        assert int(idx[0]) == 1

    def test_margin_and_entropy_score_values(self):
        """Closed-form check on a single-step sequence (END on step 2 not
        reached within 1 step: use max_length=1)."""
        step = self._controlled_step()
        logits = np.stack(
            [np.full(V, -8.0, np.float32), np.zeros(V, np.float32)]
        )
        logits[0, 3] = 8.0
        logits[1, 4] = 0.02
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        for signal in ("margin", "entropy"):
            cfg = DecodeConfig(
                max_length=1, start_id=START, end_id=END, pad_id=PAD,
                selective_signal=signal,
            )
            _, scores = greedy_sample_decode(
                step, jnp.zeros((2, H)), 2, cfg, return_scores=True
            )
            if signal == "margin":
                want = np.sort(logp, axis=-1)[:, -1] - np.sort(logp, axis=-1)[:, -2]
            else:
                want = (np.exp(logp) * logp).sum(-1)
            np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5, atol=1e-6)

    def test_margin_is_default_and_logp_available(self):
        """Default is the measured-best margin gate (selective_signal_ab);
        logp stays available and keeps its sign contract."""
        emb, W = make_dynamics()
        cfg = DecodeConfig(max_length=6, start_id=START, end_id=END, pad_id=PAD)
        assert cfg.selective_signal == "margin"
        _, scores = greedy_sample_decode(
            jax_step_fn(emb, W), jnp.zeros((3, H)), 3, cfg, return_scores=True
        )
        assert scores.shape == (3,) and np.all(np.asarray(scores) >= 0.0)
        cfg_logp = DecodeConfig(
            max_length=6, start_id=START, end_id=END, pad_id=PAD,
            selective_signal="logp",
        )
        _, s2 = greedy_sample_decode(
            jax_step_fn(emb, W), jnp.zeros((3, H)), 3, cfg_logp, return_scores=True
        )
        assert np.all(np.asarray(s2) <= 0.0)
