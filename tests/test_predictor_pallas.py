"""Predictor Pallas-path WIRING tests (hardware.pallas_interpret).

The fused kernels themselves are parity-tested in tests/test_pallas_decode.py
/ test_pallas_beam.py / test_pallas_grid.py; what was NOT covered on CPU is
the Predictor's routing around them — weight packing from the live param
tree, memory-kind dispatch (vector vs grid), tuple-weights plumbing, seed
derivation, and the chunked predict_batch contract.  hardware.pallas_interpret
runs the same wiring with interpret-mode kernels on any backend, so the
product path is pinned here: kernel-path outputs must equal the scan path
exactly at f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from img2latex_tpu.config import Config
from img2latex_tpu.data.tokenizer import LaTeXTokenizer
from img2latex_tpu.models.seq2seq import build_model
from img2latex_tpu.training.predictor import Predictor


def _predictor(memory, vocab=24, attention=True):
    cfg = Config()
    cfg.model.embedding_dim = 32
    cfg.model.decoder.hidden_dim = 32
    cfg.model.decoder.lstm_layers = 2
    cfg.model.decoder.dropout = 0.0
    cfg.model.decoder.attention = attention
    cfg.model.memory = memory
    cfg.model.encoder.cnn.img_height = 32
    cfg.model.encoder.cnn.img_width = 64
    cfg.model.encoder.cnn.conv_filters = [4, 8]
    cfg.data.max_seq_length = 12
    cfg.inference.max_length = 10
    cfg.hardware.compute_dtype = "float32"
    cfg.hardware.use_mesh = False
    cfg.hardware.pallas_conv1 = False
    model = build_model(cfg, vocab)
    h, w, c = cfg.image_shape
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, c)), jnp.zeros((2, 5), jnp.int32)
    )
    tok = LaTeXTokenizer(max_sequence_length=12)
    tok.default_init()
    return Predictor(cfg, model, variables["params"], {}, tok, batch_size=4)


def _images(n=6, h=32, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8) for _ in range(n)]


def _ab(pred, **decode_kwargs):
    """Decode the same images twice: scan path vs interpret-mode kernel path."""
    imgs = _images()
    pred.cfg.hardware.use_pallas_decode = False
    pred.cfg.hardware.pallas_interpret = False
    pred._jit_cache.clear(); pred._impl_cache.clear()
    ref = pred.predict_batch(imgs, return_ids=True, **decode_kwargs)
    pred.cfg.hardware.use_pallas_decode = True
    pred.cfg.hardware.pallas_interpret = True
    pred._jit_cache.clear(); pred._impl_cache.clear()
    got = pred.predict_batch(imgs, return_ids=True, **decode_kwargs)
    return ref, got


@pytest.mark.parametrize("memory", ["vector", "grid"])
class TestPallasWiring:
    def test_greedy(self, memory):
        ref, got = _ab(_predictor(memory), beam_size=0)
        assert [list(r) for r in ref] == [list(g) for g in got]

    def test_beam(self, memory):
        ref, got = _ab(_predictor(memory), beam_size=3, length_penalty=1.5)
        assert [list(r) for r in ref] == [list(g) for g in got]

    def test_selective_beam_kernel_matches_scan(self, memory):
        """Selective beam (greedy+confidence -> beam on the least-confident
        fraction -> merge) through the kernels == the scan-path selective
        oracle at f32."""
        ref, got = _ab(
            _predictor(memory), beam_size=3, selective_beam_frac=0.5,
            length_penalty=1.5,
        )
        assert [list(r) for r in ref] == [list(g) for g in got]

    def test_selective_beam_semantics(self, memory):
        """Every selective output row is either that row's greedy decode or
        its full-beam decode; at most ceil(frac*B) rows diverge from greedy;
        frac ~ 1 reproduces full beam exactly."""
        pred = _predictor(memory)
        imgs = _images()
        pred.cfg.hardware.use_pallas_decode = False
        greedy = pred.predict_batch(imgs, beam_size=0, return_ids=True)
        beam = pred.predict_batch(imgs, beam_size=3, return_ids=True)
        sel = pred.predict_batch(
            imgs, beam_size=3, selective_beam_frac=0.34, return_ids=True
        )
        diverged = 0
        for s, g, b in zip(sel, greedy, beam):
            assert s == g or s == b
            if s != g:
                diverged += 1
        assert diverged <= int(np.ceil(0.34 * pred.batch_size)) * 2  # 6 imgs, 2 chunks
        full = pred.predict_batch(
            imgs, beam_size=3, selective_beam_frac=0.999, return_ids=True
        )
        assert full == beam

    def test_sampling_support(self, memory):
        """Sampling draws differ across RNG contracts (scan uses jax PRNG,
        kernels an in-kernel hash) — pin that the kernel path ENGAGES and
        produces well-formed sequences over the vocab."""
        pred = _predictor(memory)
        pred.cfg.hardware.use_pallas_decode = True
        pred.cfg.hardware.pallas_interpret = True
        out = pred.predict_batch(
            _images(), return_ids=True, temperature=0.8, top_k=4, seed=7
        )
        assert len(out) == 6
        for seq in out:
            assert all(0 <= t < pred.tokenizer.vocab_size for t in seq)

    def test_topp_sampling_support(self, memory):
        """Top-p now routes to the sampling kernels too (sort-free in-kernel
        nucleus); pin that the path engages and emits vocab-range tokens."""
        pred = _predictor(memory)
        pred.cfg.hardware.use_pallas_decode = True
        pred.cfg.hardware.pallas_interpret = True
        out = pred.predict_batch(
            _images(), return_ids=True, temperature=0.9, top_p=0.8, seed=13
        )
        assert len(out) == 6
        for seq in out:
            assert all(0 <= t < pred.tokenizer.vocab_size for t in seq)

    def test_early_exit_matches(self, memory):
        pred = _predictor(memory)
        pred.cfg.hardware.use_pallas_decode = True
        pred.cfg.hardware.pallas_interpret = True
        imgs = _images()
        full = pred.predict_batch(imgs, return_ids=True, beam_size=0)
        pred._jit_cache.clear(); pred._impl_cache.clear()
        early = pred.predict_batch(imgs, return_ids=True, beam_size=0, early_exit=True)
        assert [list(r) for r in full] == [list(g) for g in early]

    def test_whole_split_kernel_path(self, memory):
        """The whole-split lax.map program (_decode_split_fn) over the
        interpret-mode kernels must equal per-batch kernel calls token for
        token — the exact program the resident eval dispatches on TPU."""
        import jax

        from img2latex_tpu.decoding.decode import DecodeConfig

        pred = _predictor(memory)
        pred.cfg.hardware.use_pallas_decode = True
        pred.cfg.hardware.pallas_interpret = True
        B, n_b = 4, 2
        h, w, c = pred.cfg.image_shape
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, size=(n_b, B, h, w, c), dtype=np.uint8)
        dcfg = DecodeConfig(
            max_length=10,
            start_id=pred.tokenizer.start_token_id,
            end_id=pred.tokenizer.end_token_id,
            pad_id=pred.tokenizer.pad_token_id,
        )
        keys = jax.random.split(jax.random.PRNGKey(0), n_b)
        run_b = pred._decode_fn(B, dcfg)
        per_batch = np.stack(
            [np.asarray(run_b(jnp.asarray(imgs[i]), keys[i])) for i in range(n_b)]
        )
        run_s = pred._decode_split_fn(n_b, B, dcfg)
        whole = np.asarray(run_s(jnp.asarray(imgs), keys))
        np.testing.assert_array_equal(per_batch, whole)

    def test_seed_does_not_retrace(self, memory):
        """Sampling randomness rides the runtime rng argument; a new seed
        must reuse the cached executable, not compile a fresh one."""
        pred = _predictor(memory)
        pred.cfg.hardware.use_pallas_decode = True
        pred.cfg.hardware.pallas_interpret = True
        imgs = _images()
        pred.predict_batch(imgs, return_ids=True, temperature=0.8, top_k=4, seed=1)
        n = len(pred._jit_cache)
        pred.predict_batch(imgs, return_ids=True, temperature=0.8, top_k=4, seed=2)
        assert len(pred._jit_cache) == n

    def test_attention_off_routes_to_vector_kernels(self, memory):
        """attention=False degenerates the context to memory[:, 0, :] for
        BOTH memory kinds (models/decoder.py::DecoderCell); the Pallas gate
        must route grid checkpoints to the vector kernels then (the grid
        kernels always attend — and the attention params don't exist)."""
        ref, got = _ab(_predictor(memory, attention=False), beam_size=0)
        assert [list(r) for r in ref] == [list(g) for g in got]


@pytest.mark.parametrize("memory", ["vector", "grid"])
class TestSelectiveSignalRouting:
    """inference.selective_signal=margin/entropy: the whole-greedy kernels
    emit all three confidence signals in-kernel (decode_step._decode_loop),
    so the kernel selective path must match the scan path exactly at f32,
    and outputs keep the selective contract: every row is its greedy or its
    full-beam decode."""

    @pytest.mark.parametrize("signal", ["margin", "entropy", "margin_logp:0.5"])
    def test_scan_semantics(self, memory, signal):
        pred = _predictor(memory)
        pred.cfg.inference.selective_signal = signal
        pred.cfg.hardware.use_pallas_decode = False
        imgs = _images()
        greedy = pred.predict_batch(imgs, beam_size=0, return_ids=True)
        beam = pred.predict_batch(imgs, beam_size=3, return_ids=True)
        sel = pred.predict_batch(
            imgs, beam_size=3, selective_beam_frac=0.34, return_ids=True
        )
        assert all(s == g or s == b for s, g, b in zip(sel, greedy, beam))

    @pytest.mark.parametrize("signal", ["margin", "entropy", "margin_logp:0.5"])
    def test_signals_kernel_matches_scan(self, memory, signal):
        """With pallas enabled and a non-logp signal, the in-kernel
        confidence must rank rows identically to the scan oracle — same
        selected set, token-identical output."""
        pred = _predictor(memory)
        pred.cfg.inference.selective_signal = signal
        ref, got = _ab(
            pred, beam_size=3, selective_beam_frac=0.5, length_penalty=1.5
        )
        assert [list(r) for r in ref] == [list(g) for g in got]
