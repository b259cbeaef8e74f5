"""Synthetic formula-image corpus for tests and benchmarks.

The reference repo's image blobs are git-LFS objects absent from the snapshot
(``/root/reference/.MISSING_LARGE_BLOBS``), so the framework ships a synthetic
generator: each vocabulary token renders as a deterministic black-on-white
glyph pattern, glyphs are placed left-to-right, and the image/label pair is a
learnable mapping that exercises the full pipeline (PIL decode path included,
via :func:`write_synthetic_corpus` which writes real PNGs + the reference's
``.lst``/formulas file layout, ``SURVEY.md`` §1 data artifacts).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_GLYPH_H, _GLYPH_W = 12, 8


def token_glyph(token_id: int, h: int = _GLYPH_H, w: int = _GLYPH_W) -> np.ndarray:
    """Deterministic binary glyph for a token id (uint8, 0=ink, 255=paper)."""
    rng = np.random.default_rng(0xC0FFEE + int(token_id))
    pattern = rng.random((h, w)) < 0.45
    # Force a distinctive border bit per id so small vocabularies stay separable.
    pattern[0, :] = (token_id % 2) == 0
    pattern[:, 0] = (token_id % 3) == 0
    return np.where(pattern, 0, 255).astype(np.uint8)


def render_formula_image(
    token_ids: Sequence[int],
    img_height: int = 32,
    margin: int = 2,
    scale: int = 2,
) -> np.ndarray:
    """Render token ids into a variable-width grayscale image (H, W) uint8."""
    gh, gw = _GLYPH_H * scale, _GLYPH_W * scale
    width = max(len(token_ids), 1) * (gw + margin) + margin
    canvas = np.full((img_height, width), 255, dtype=np.uint8)
    y0 = max((img_height - gh) // 2, 0)
    x = margin
    for tid in token_ids:
        glyph = np.kron(token_glyph(int(tid)), np.ones((scale, scale), dtype=np.uint8))
        h = min(gh, img_height - y0)
        canvas[y0 : y0 + h, x : x + gw] = glyph[:h]
        x += gw + margin
    return canvas


def random_formulas(
    n: int,
    vocab_tokens: Sequence[str],
    min_len: int = 3,
    max_len: int = 12,
    seed: int = 0,
) -> List[str]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        length = int(rng.integers(min_len, max_len + 1))
        out.append(" ".join(rng.choice(vocab_tokens, size=length)))
    return out


def write_synthetic_corpus(
    root: str,
    n_train: int = 64,
    n_val: int = 16,
    n_test: int = 16,
    vocab_tokens: Optional[Sequence[str]] = None,
    img_height: int = 32,
    seed: int = 0,
) -> str:
    """Write a miniature IM2LaTeX-layout dataset under ``root``.

    Produces ``im2latex_{train,validate,test}_filter.lst`` (lines
    ``<image>.png <formula_line_index>``), ``im2latex_formulas.norm.lst`` and
    an ``img/`` directory — the exact artifact layout the reference consumes
    (``img2latex/data/dataset.py:220-274``).
    """
    from PIL import Image

    if vocab_tokens is None:
        vocab_tokens = (
            "+ - = ( ) \\frac \\sum a b c x y z 0 1 2 _ ^".split()
        )
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    totals = {"train": n_train, "validate": n_val, "test": n_test}
    formulas = random_formulas(sum(totals.values()), vocab_tokens, seed=seed)
    with open(os.path.join(root, "im2latex_formulas.norm.lst"), "w") as f:
        f.write("\n".join(formulas) + "\n")

    # Token ids for rendering: position in an alphabetical token list (stable,
    # independent of the tokenizer so images don't depend on fit order).
    render_ids = {t: i for i, t in enumerate(sorted(set(vocab_tokens)))}
    idx = 0
    for split, count in totals.items():
        lines = []
        for _ in range(count):
            name = f"syn_{idx:06d}"
            ids = [render_ids[t] for t in formulas[idx].split()]
            arr = render_formula_image(ids, img_height=img_height)
            Image.fromarray(arr, mode="L").save(os.path.join(root, "img", f"{name}.png"))
            lines.append(f"{name}.png {idx}")
            idx += 1
        with open(os.path.join(root, f"im2latex_{split}_filter.lst"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def synthetic_batch(
    batch_size: int,
    img_shape: Tuple[int, int, int],
    max_seq_length: int,
    vocab_size: int,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """In-memory (images_u8 NHWC, formulas int32) batch for unit tests/benches.

    Formulas follow the <START> body <END> PAD... layout with ids >= 4.
    """
    from img2latex_tpu.data.transforms import array_to_canvas_u8

    if vocab_size <= 4:
        raise ValueError(f"synthetic_batch needs vocab_size > 4 (body ids are >= 4), got {vocab_size}")
    rng = np.random.default_rng(seed)
    h, w, c = img_shape
    images = np.zeros((batch_size, h, w, c), dtype=np.uint8)
    formulas = np.zeros((batch_size, max_seq_length), dtype=np.int32)
    for i in range(batch_size):
        body_len = int(rng.integers(3, max(4, max_seq_length // 2)))
        body = rng.integers(4, vocab_size, size=body_len)
        # token_glyph is unique per id — render the true ids (a modulo here
        # would alias distinct labels onto identical glyphs, capping any
        # learnability check below 100%).
        raw = render_formula_image(body)
        canvas = array_to_canvas_u8(raw[:, :, None], h, w)
        images[i] = canvas if c == 1 else np.repeat(canvas, c, axis=2)
        seq = [1] + body.tolist() + [2]
        formulas[i, : len(seq)] = seq[:max_seq_length]
    return images, formulas
