import numpy as np
import pytest

from img2latex_tpu.data.tokenizer import LaTeXTokenizer


def test_special_token_ids_pinned():
    tok = LaTeXTokenizer(max_sequence_length=10)
    assert tok.pad_token_id == 0
    assert tok.start_token_id == 1
    assert tok.end_token_id == 2
    assert tok.unk_token_id == 3
    assert tok.vocab_size == 4


def test_fit_frequency_order():
    tok = LaTeXTokenizer(max_sequence_length=10)
    tok.fit(["a b b c c c", "c"])
    # c appears 4x, b 2x, a 1x -> ids 4, 5, 6
    assert tok.token_to_id["c"] == 4
    assert tok.token_to_id["b"] == 5
    assert tok.token_to_id["a"] == 6
    assert tok.vocab_size == 7


def test_encode_decode_roundtrip():
    tok = LaTeXTokenizer(max_sequence_length=16)
    tok.fit(["\\frac { a } { b }"])
    ids = tok.encode("\\frac { a } { b }")
    assert tok.decode(ids) == "\\frac { a } { b }"


def test_encode_unknown_maps_to_unk():
    tok = LaTeXTokenizer(max_sequence_length=8)
    tok.fit(["x y"])
    assert tok.encode("x z") == [tok.token_to_id["x"], tok.unk_token_id]


def test_encode_special_tokens_wrap():
    tok = LaTeXTokenizer(max_sequence_length=8)
    tok.fit(["x"])
    ids = tok.encode("x", add_special_tokens=True)
    assert ids[0] == tok.start_token_id
    assert ids[-1] == tok.end_token_id


def test_decode_skips_special_tokens():
    tok = LaTeXTokenizer(max_sequence_length=8)
    tok.fit(["x"])
    x = tok.token_to_id["x"]
    assert tok.decode([tok.start_token_id, x, tok.end_token_id, tok.pad_token_id]) == "x"
    full = tok.decode([tok.start_token_id, x], skip_special_tokens=False)
    assert full == "<START> x"


def test_encode_batch_static_shape_and_padding():
    tok = LaTeXTokenizer(max_sequence_length=6)
    tok.fit(["a b c", "a"])
    batch = tok.encode_batch(["a b c", "a"], add_special_tokens=True)
    assert batch.shape == (2, 6)
    assert batch.dtype == np.int32
    assert batch[1, 3] == tok.pad_token_id
    # truncation to max_sequence_length
    long = tok.encode_batch(["a b c a b c a b c"])
    assert long.shape == (1, 6)


def test_encode_batch_flag_combinations():
    """The advertised non-default flags must work, not crash: no truncation
    widens to the longest row; no padding returns ragged arrays."""
    tok = LaTeXTokenizer(max_sequence_length=4)
    tok.fit(["a b c", "a"])
    wide = tok.encode_batch(["a b c a b c a b c"], truncation=False)
    assert wide.shape == (1, 9)
    ragged = tok.encode_batch(["a b", "a"], padding=False)
    assert isinstance(ragged, list)
    assert [len(r) for r in ragged] == [2, 1]
    zero = tok.encode_batch(["a"], length=0)
    assert zero.shape == (1, 0)


def test_decode_skips_out_of_vocab_like_unk():
    """OOV ids map to UNK; with skip_special_tokens they must be skipped
    exactly like a real UNK id (not emitted as a literal <UNK>)."""
    tok = LaTeXTokenizer(max_sequence_length=6)
    tok.fit(["x"])
    x = tok.token_to_id["x"]
    assert tok.decode([x, tok.unk_token_id, 9999]) == "x"
    assert tok.decode([x, 9999], skip_special_tokens=False) == "x <UNK>"


def test_decode_rows_matches_decode():
    """The vectorized batch detokenizer (eval hot path) == per-row decode
    with skip_special_tokens=True, including OOV/negative/empty rows; the
    lookup table rebuilds after a vocab change."""
    import numpy as np

    tok = LaTeXTokenizer(max_sequence_length=24)
    tok.default_init()
    rng = np.random.default_rng(3)
    V = tok.vocab_size
    rows = [
        rng.integers(-2, V + 3, size=int(rng.integers(0, 20))).tolist()
        for _ in range(200)
    ]
    assert tok.decode_rows(rows) == [tok.decode(r) for r in rows]
    tok2 = LaTeXTokenizer(max_sequence_length=24)
    tok2.fit(["a b", "c"])
    assert tok2.decode_rows(rows) == [tok2.decode(r) for r in rows]
    # vocab grows after a decode_rows call: table must rebuild
    tok2.fit(["a b c d e f g"])
    assert tok2.decode_rows(rows) == [tok2.decode(r) for r in rows]


def test_save_load_roundtrip(tmp_path):
    tok = LaTeXTokenizer(max_sequence_length=12)
    tok.fit(["\\alpha + \\beta = x", "x + x"])
    path = str(tmp_path / "vocab.json")
    tok.save(path)
    tok2 = LaTeXTokenizer.load(path)
    assert tok2.token_to_id == tok.token_to_id
    assert tok2.max_sequence_length == 12
    assert tok2.decode(tok2.encode("x + x")) == "x + x"


def test_load_reference_torch_format(tmp_path):
    torch = pytest.importorskip("torch")
    tok = LaTeXTokenizer(max_sequence_length=9)
    tok.fit(["a b"])
    path = str(tmp_path / "vocab.pt")
    torch.save(tok.to_config(), path)
    tok2 = LaTeXTokenizer.load(path)
    assert tok2.token_to_id == tok.token_to_id
    assert tok2.max_sequence_length == 9


def test_default_init_vocab():
    tok = LaTeXTokenizer(max_sequence_length=8)
    tok.default_init()
    assert tok.vocab_size > 40
    assert "\\frac" in tok.token_to_id


def test_fit_on_formulas_file(tmp_path):
    p = tmp_path / "formulas.lst"
    p.write_text("a + b\nx ^ 2\n")
    tok = LaTeXTokenizer(max_sequence_length=10)
    tok.fit_on_formulas_file(str(p))
    # START/END wrapped lines mean the special *strings* also get counted,
    # but they are already in the vocab so ids stay pinned.
    assert tok.start_token_id == 1
    for t in ["a", "+", "b", "x", "^", "2"]:
        assert t in tok.token_to_id
