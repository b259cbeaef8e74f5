"""Realistic corpus generation: random LaTeX formulas rendered by mathtext.

A step up from the glyph-barcode corpus (``synthetic.py``): formulas are
sampled from a small LaTeX grammar (fractions, sub/superscripts, radicals,
greek, operators — the IM2LaTeX token distribution's main families) and
rendered to real anti-aliased images by matplotlib's mathtext engine.  The
result exercises the genuine pipeline difficulty: variable-width images,
aspect-ratio geometry, token-image alignment learned from pixels.

Written in the exact IM2LaTeX artifact layout (``.lst`` splits + formulas
file + ``img/``), so the standard CLI/training path consumes it unchanged.
"""

from __future__ import annotations

import io
import os
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)

ATOMS = list("abcxyznmk") + ["0", "1", "2", "3", "4", "5", "7", "9"]
GREEK = ["\\alpha", "\\beta", "\\gamma", "\\lambda", "\\mu", "\\pi", "\\sigma", "\\theta", "\\omega", "\\phi"]
BINOPS = ["+", "-", "="]
FUNCS = ["\\sin", "\\cos", "\\log"]


def _atom(rng) -> List[str]:
    r = rng.random()
    if r < 0.7:
        return [str(rng.choice(ATOMS))]
    return [str(rng.choice(GREEK))]


def _unit(rng, depth: int, tall: bool = False) -> List[str]:
    """One visual unit: atom, scripted atom, frac, sqrt or function call.

    ``tall=True`` (the "im2latex" profile) nests to depth 3 and boosts the
    fraction probability so LONG formulas are also TALL — matching the real
    dataset, where 100+-token formulas carry vertical structure and still
    pass the aspect filter (height-64 resize must fit the 800px canvas)."""
    r = rng.random()
    max_depth = 3 if tall else 2
    a, b, c, d = (0.30, 0.45, 0.78, 0.88) if tall else (0.45, 0.6, 0.75, 0.85)
    if depth >= max_depth or r < a:
        toks = _atom(rng)
    elif r < b:  # sub/superscript
        base = _atom(rng)
        script = "_" if rng.random() < 0.5 else "^"
        toks = base + [script, "{", *_atom(rng), "}"]
    elif r < c:  # fraction
        toks = ["\\frac", "{", *_expr(rng, depth + 1, max_units=2, tall=tall), "}",
                "{", *_expr(rng, depth + 1, max_units=2, tall=tall), "}"]
    elif r < d:  # sqrt
        toks = ["\\sqrt", "{", *_expr(rng, depth + 1, max_units=2, tall=tall), "}"]
    else:  # function
        toks = [str(rng.choice(FUNCS)), "(", *_atom(rng), ")"]
    return toks


def _expr(rng, depth: int = 0, max_units: Optional[int] = None, tall: bool = False) -> List[str]:
    # "=" only reads naturally at the top level; nested expressions use +/-.
    ops = BINOPS if depth == 0 else ["+", "-"]
    n = int(rng.integers(1, (max_units or 4) + 1))
    out = _unit(rng, depth, tall)
    for _ in range(n - 1):
        out += [str(rng.choice(ops))] + _unit(rng, depth, tall)
    return out


def random_latex_formulas(
    n: int, seed: int = 0, max_tokens: int = 40, length_profile: str = "short"
) -> List[str]:
    """Sample formulas from the grammar.

    ``length_profile``:

    * ``"short"`` — one or two top-level expressions, <= max_tokens (the
      round-1 48-token-seq corpora);
    * ``"im2latex"`` — per-formula target length drawn from a lognormal
      (median ~40 tokens, tail toward ``max_tokens``), built by chaining
      top-level expressions — emulating the reference dataset's length
      distribution (max decoder sequence 141, reference
      ``config.yaml:13``; dataset mean width 319px at height ~61,
      ``README.md:47-52``).
    """
    rng = np.random.default_rng(seed)
    tall = length_profile == "im2latex"
    out = []
    while len(out) < n:
        toks = _expr(rng, 0, tall=tall)
        if tall:
            target = int(np.clip(rng.lognormal(np.log(40.0), 0.55), 8, max_tokens))
            while len(toks) < target:
                chunk = [str(rng.choice(BINOPS))] + _expr(rng, 0, tall=True)
                if len(toks) + len(chunk) > max_tokens:
                    # Stop just under the cap instead of rejecting the whole
                    # formula below — whole-chunk overshoot rejection would
                    # systematically suppress the profile's long tail.
                    break
                toks += chunk
        elif rng.random() < 0.5:
            toks += [str(rng.choice(BINOPS))] + _expr(rng, 0)
        if len(toks) <= max_tokens:
            out.append(" ".join(toks))
    return out


_AGG_PARSER = None


def render_mathtext(formula_tokens: str, fontsize: int = 22, dpi: int = 100) -> np.ndarray:
    """Render a whitespace-tokenized LaTeX formula to a grayscale uint8 array
    (white background), via matplotlib mathtext (no TeX needed).

    Renders through ``MathTextParser("agg")`` directly: one glyph
    rasterization, no Figure construction and no PNG encode/decode round
    trip.  Measured 2.5x the ``math_to_image`` formulation on the corpus
    length profile (15.7 vs 6.2 img/s on this 1-core host) — the difference
    between a ~2 h and a ~5 h 115k-image corpus render.  The raster is the
    formula's alpha mask; ``255 - alpha`` is the same antialiased
    black-on-white image ``math_to_image`` produced (glyph margins differ by
    a few pixels: the direct parse includes the baseline depth row-exactly
    while the Figure path re-rounded it at 72 dpi)."""
    global _AGG_PARSER
    if _AGG_PARSER is None:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import mathtext

        _AGG_PARSER = mathtext.MathTextParser("agg")
    from matplotlib.font_manager import FontProperties

    # mathtext wants compact LaTeX (no spaces needed, but they are harmless
    # except inside commands): join with spaces is fine.  math_to_image's
    # prop=None drew at rcParams font.size (10 pt); keep that glyph scale.
    expr = "$" + formula_tokens + "$"
    rp = _AGG_PARSER.parse(expr, dpi=dpi, prop=FontProperties(size=10))
    alpha = np.asarray(rp.image)
    return (255 - alpha).astype(np.uint8)


def _render_or_none(args: Tuple[str, int]):
    """Pool worker: render one formula, None on failure (re-sampled later)."""
    formula, fontsize = args
    try:
        arr = render_mathtext(formula, fontsize=fontsize)
        if arr.shape[0] < 8 or arr.shape[1] < 8:
            return None
        return arr
    except Exception:
        return None


def write_mathtext_corpus(
    root: str,
    n_train: int = 512,
    n_val: int = 64,
    n_test: int = 64,
    seed: int = 0,
    fontsize: int = 22,
    workers: int = 0,
    max_tokens: int = 40,
    length_profile: str = "short",
    max_aspect: Optional[float] = None,
) -> Tuple[str, int]:
    """Write a rendered-LaTeX corpus in the IM2LaTeX layout; returns
    (root, n_failed).  Formulas that mathtext rejects are re-sampled.
    ``workers > 0`` renders in a process pool (matplotlib is ~23 renders/s
    per core; large corpora need the parallelism).

    ``max_aspect`` drops renders wider than ``max_aspect * height`` and
    re-samples — the reference dataset's own size filtering (its splits are
    ``*_filter.lst`` files).  11.5 keeps a height-64 aspect-resize within
    the 800px canvas."""
    from PIL import Image

    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    total = n_train + n_val + n_test
    formulas: List[str] = []
    rng_seed = seed
    failed = 0
    pool = None
    if workers > 0:
        import multiprocessing as mp

        # fork shares the warm matplotlib state; fall back to the platform
        # default (spawn) where fork does not exist — _render_or_none is a
        # picklable module-level function either way.
        method = "fork" if "fork" in mp.get_all_start_methods() else None
        pool = mp.get_context(method).Pool(workers)
    t_start = time.time()
    try:
        while len(formulas) < total:
            batch = random_latex_formulas(
                total - len(formulas) + 8,
                seed=rng_seed,
                max_tokens=max_tokens,
                length_profile=length_profile,
            )
            rng_seed += 1
            # Render in bounded chunks: each accepted image is written to
            # disk within a chunk, so a 90k-corpus run streams to disk with
            # bounded RAM and visible progress instead of buffering every
            # render in a list first.  Sampling and acceptance order are
            # unchanged — the corpus for a given seed is byte-identical to
            # the unchunked formulation.
            chunk = 1024
            done = False
            for off in range(0, len(batch), chunk):
                sub = batch[off : off + chunk]
                if pool is not None:
                    rendered = pool.map(
                        _render_or_none, [(f, fontsize) for f in sub], chunksize=16
                    )
                else:
                    rendered = [_render_or_none((f, fontsize)) for f in sub]
                for f, arr in zip(sub, rendered):
                    if len(formulas) >= total:
                        done = True
                        break
                    if arr is None or (
                        max_aspect is not None
                        and arr.shape[1] > max_aspect * arr.shape[0]
                    ):
                        failed += 1
                        continue
                    Image.fromarray(arr, mode="L").save(
                        os.path.join(root, "img", f"mt_{len(formulas):06d}.png")
                    )
                    formulas.append(f)
                if done:
                    break
                dt = time.time() - t_start
                logger.info(
                    "mathtext corpus: %d/%d rendered (%.1f img/s, %d rejected)",
                    len(formulas), total, len(formulas) / max(dt, 1e-9), failed,
                )
    finally:
        if pool is not None:
            pool.close()
            pool.join()
    with open(os.path.join(root, "im2latex_formulas.norm.lst"), "w") as fh:
        fh.write("\n".join(formulas) + "\n")
    counts = {"train": n_train, "validate": n_val, "test": n_test}
    idx = 0
    for split, count in counts.items():
        lines = []
        for _ in range(count):
            name = f"mt_{idx:06d}"
            lines.append(f"{name}.png {idx}")
            idx += 1
        with open(os.path.join(root, f"im2latex_{split}_filter.lst"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    logger.info("Wrote mathtext corpus: %d formulas (%d render failures)", total, failed)
    return root, failed
