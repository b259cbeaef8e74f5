"""Serialized serving artifacts: ``jax.export`` the end-to-end decode.

Deployment capability beyond the reference (its ``Predictor`` needs the whole
Python package + a torch checkpoint at serving time, reference
``img2latex/training/predictor.py:20-137``): serialize the compiled decode
path — uint8 canvas batch -> token ids — to portable StableHLO with the
weights baked in as constants.  A serving host then needs only JAX and the
tokenizer config embedded in the manifest (no flax, no model code, no
checkpoint) to run inference, and the artifact is immune to model-code drift.

Layout of an export directory::

    manifest.json            # shapes, decode config, tokenizer, platforms
    decode_b{B}.jaxexport    # one serialized Exported per batch size

The exported function is the pure-XLA scan path (``Predictor._decode_fn``
with every Pallas fast path and the mesh forced off): plain StableHLO, so one
artifact can target several platforms (``platforms=("tpu", "cpu")``).  The
Pallas kernels lower to Mosaic custom-calls whose serialization is not
stability-guaranteed across compiler versions — wrong trade for an artifact
whose point is surviving environment changes; on-TPU serving that wants the
kernels should load the checkpoint with ``Predictor`` instead.

Signature of every exported entry: ``(images_u8 (B,H,W,C), rng uint32[2])``
-> ``tokens int32 (B, max_length+1)``; greedy/beam ignore ``rng``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from img2latex_tpu.utils.logging import get_logger

logger = get_logger(__name__)

MANIFEST_NAME = "manifest.json"
MANIFEST_VERSION = 1

# DecodeConfig fields that ride through the manifest verbatim.
_DCFG_FIELDS = (
    "max_length",
    "start_id",
    "end_id",
    "pad_id",
    "temperature",
    "top_k",
    "top_p",
    "beam_size",
    "length_penalty",
    "selective_beam_frac",
    "selective_signal",
    "early_exit",
)


def _artifact_name(batch: int, width: Optional[int] = None) -> str:
    return f"decode_b{batch}.jaxexport" if width is None else (
        f"decode_b{batch}_w{width}.jaxexport"
    )


def _artifact_key(batch: int, width: Optional[int] = None) -> str:
    return str(batch) if width is None else f"{batch}_w{width}"


_DYN_KEY = "dyn"
_DYN_NAME = "decode_bdyn.jaxexport"


def _build_symbolic_decode(pred, dcfg):
    """Batch-polymorphic end-to-end decode for ``jax.export``: derives B from
    ``images_u8.shape[0]`` (a symbolic dim at export time) instead of the
    static ``batch`` that ``Predictor._decode_fn`` closes over.  Scan-path
    only — mirrors ``predictor.run_impl`` minus selective beam (its bottom-k
    row count would need a value-dependent shape)."""
    import jax.numpy as jnp

    from img2latex_tpu.decoding.decode import beam_decode, greedy_sample_decode
    from img2latex_tpu.models.seq2seq import Seq2SeqModel
    from img2latex_tpu.ops.preprocess import normalize_images

    model = pred.model
    variables = pred._variables()
    mean = tuple(pred.cfg.preprocessing.normalization_mean)
    std = tuple(pred.cfg.preprocessing.normalization_std)
    layers = pred.cfg.model.decoder.lstm_layers
    hidden = pred.cfg.model.decoder.hidden_dim
    dtype = jnp.dtype(pred.cfg.hardware.compute_dtype)

    def run(images_u8, rng):
        B = images_u8.shape[0]
        x = normalize_images(images_u8, mean, std)
        memory = model.apply(variables, x, method=Seq2SeqModel.encode)
        mem_proj = model.apply(variables, memory, method=Seq2SeqModel.memory_proj)
        if dcfg.beam_size > 0:
            K = dcfg.beam_size
            mem_exp = jnp.repeat(memory, K, axis=0)
            proj_exp = None if mem_proj is None else jnp.repeat(mem_proj, K, axis=0)

            def b_step(tokens, carry):
                return model.apply(
                    variables, mem_exp, tokens, carry, proj_exp,
                    method=Seq2SeqModel.decode_step,
                )

            carry0 = (
                jnp.zeros((layers, B * K, hidden), dtype),
                jnp.zeros((layers, B * K, hidden), dtype),
            )
            tokens, _ = beam_decode(b_step, carry0, B, K, dcfg)
            return tokens

        def step_fn(tokens, carry):
            return model.apply(
                variables, memory, tokens, carry, mem_proj,
                method=Seq2SeqModel.decode_step,
            )

        carry0 = (
            jnp.zeros((layers, B, hidden), dtype),
            jnp.zeros((layers, B, hidden), dtype),
        )
        return greedy_sample_decode(step_fn, carry0, B, dcfg, rng=rng)

    return run


def export_checkpoint(
    checkpoint_path: str,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 16),
    beam_size: Optional[int] = None,
    max_length: Optional[int] = None,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    length_penalty: Optional[float] = None,
    selective_beam_frac: Optional[float] = None,
    platforms: Optional[Sequence[str]] = None,
    config_overrides: Optional[Dict[str, Any]] = None,
    symbolic_batch: bool = False,
    bucket_widths: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    """Export a trained checkpoint's decode path to ``out_dir``.

    One serialized executable per entry in ``batch_sizes``; decode knobs
    default to the checkpoint's ``inference`` config exactly like
    ``Predictor.predict_batch``.  ``platforms=None`` targets the current
    backend only; pass e.g. ``("tpu", "cpu")`` for a multi-platform artifact.
    Returns the manifest dict (also written to ``manifest.json``).

    ``symbolic_batch=True`` exports ONE batch-polymorphic executable instead
    (``jax.export.symbolic_shape``): the artifact accepts any batch size with
    no padding waste, at the cost of one XLA compile per distinct batch seen
    at serving time (``batch_sizes[-1]`` is kept as the server coalesce
    default).  Selective beam is excluded there — its bottom-k row count is a
    value-dependent shape.

    ``bucket_widths`` additionally exports one executable per (batch size,
    bucket width) at the bucket's narrower canvas (CNN encoder cost scales
    with width — the live path's 1.28x steady-state win), alongside the
    full-canvas entries.  ``ExportedPredictor`` then routes each input
    through the shared :func:`data.transforms.assign_bucket` rule, exactly
    like ``Predictor._predict_bucketed``; outputs stay identical to the
    full-canvas decode (white-margin + feature-fill construction).  Both
    model families bucket (CNN conv-stack seam; ResNet layer4 seam with the
    receptive-field margin); incompatible with ``symbolic_batch`` (each
    bucket would need its own polymorphic export — not worth 2x the
    artifact count).
    """
    import jax
    import jax.numpy as jnp

    from img2latex_tpu.decoding.decode import DecodeConfig
    from img2latex_tpu.training.predictor import Predictor

    overrides: Dict[str, Any] = {
        # Pure-XLA, single-device program (see module docstring).
        "hardware.use_pallas_decode": False,
        "hardware.pallas_chain": False,
        "hardware.int8_encoder": False,
        "hardware.use_mesh": False,
    }
    if config_overrides:
        overrides.update(config_overrides)
    pred = Predictor.from_checkpoint(
        checkpoint_path, use_pallas_conv1=False, config_overrides=overrides
    )
    icfg = pred.cfg.inference
    dcfg = DecodeConfig(
        max_length=max_length if max_length is not None else icfg.max_length,
        start_id=pred.tokenizer.start_token_id,
        end_id=pred.tokenizer.end_token_id,
        pad_id=pred.tokenizer.pad_token_id,
        temperature=temperature if temperature is not None else icfg.temperature,
        top_k=top_k if top_k is not None else icfg.top_k,
        top_p=top_p if top_p is not None else icfg.top_p,
        beam_size=beam_size if beam_size is not None else icfg.beam_size,
        length_penalty=(
            length_penalty if length_penalty is not None else icfg.length_penalty
        ),
        selective_beam_frac=(
            selective_beam_frac
            if selective_beam_frac is not None
            else getattr(icfg, "selective_beam_frac", 0.0)
        ),
        # Bake the checkpoint's gating signal too — a margin/entropy-gated
        # config must beam-upgrade the same rows as the live path.
        selective_signal=getattr(icfg, "selective_signal", "logp"),
        # The fixed-length scan exports everywhere; the while_loop variant
        # would too, but a serving artifact should not make its step count
        # depend on the weights' behavior.
        early_exit=False,
    )

    os.makedirs(out_dir, exist_ok=True)
    h, w, c = pred.cfg.image_shape
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    plats = list(platforms) if platforms else None
    buckets: List[int] = []
    if bucket_widths:
        if symbolic_batch:
            raise ValueError(
                "bucket_widths is incompatible with symbolic_batch "
                "(one polymorphic export per bucket width; export fixed "
                "batch sizes instead)"
            )
        stride = pred._bucket_stride()
        margin = pred.bucket_margin_px()
        for bw in sorted(set(int(b) for b in bucket_widths)):
            if bw % stride:
                raise ValueError(
                    f"bucket width {bw} is not a multiple of the conv "
                    f"stride {stride}"
                )
            if bw + margin >= w:
                raise ValueError(
                    f"bucket width {bw} + margin {margin} must be narrower "
                    f"than the full canvas ({w})"
                )
            buckets.append(bw)
    if symbolic_batch:
        if 0.0 < dcfg.selective_beam_frac < 1.0:
            raise ValueError(
                "symbolic_batch is incompatible with selective_beam_frac "
                "(value-dependent beam subset shape); export fixed batch sizes"
            )
        (b,) = jax.export.symbolic_shape("b")
        run = jax.jit(_build_symbolic_decode(pred, dcfg))
        exp = jax.export.export(run, platforms=plats)(
            jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        )
        blob = exp.serialize()
        with open(os.path.join(out_dir, _DYN_NAME), "wb") as f:
            f.write(blob)
        logger.info(
            "Exported batch-polymorphic decode (%s, %.1f MB) -> %s",
            ",".join(exp.platforms),
            len(blob) / 1e6,
            os.path.join(out_dir, _DYN_NAME),
        )
    else:
        for B in batch_sizes:
            for bw in [None] + buckets:
                canvas_w = w if bw is None else bw + margin
                run = pred._decode_fn(B, dcfg, width=bw)
                exp = jax.export.export(run, platforms=plats)(
                    jax.ShapeDtypeStruct((B, h, canvas_w, c), jnp.uint8),
                    jax.ShapeDtypeStruct((2,), jnp.uint32),
                )
                blob = exp.serialize()
                path = os.path.join(out_dir, _artifact_name(B, bw))
                with open(path, "wb") as f:
                    f.write(blob)
                logger.info(
                    "Exported batch-%d%s decode (%s, %.1f MB) -> %s",
                    B,
                    "" if bw is None else f" width-{bw}",
                    ",".join(exp.platforms),
                    len(blob) / 1e6,
                    path,
                )

    manifest: Dict[str, Any] = {
        "version": MANIFEST_VERSION,
        "jax_version": jax.__version__,
        "image_shape": [h, w, c],
        "pad_value": int(pred.cfg.preprocessing.pad_value),
        "batch_sizes": batch_sizes,
        "platforms": plats or [jax.default_backend()],
        "decode": {k: getattr(dcfg, k) for k in _DCFG_FIELDS},
        "vocab_size": pred.tokenizer.vocab_size,
        "tokenizer_config": pred.tokenizer.to_config(),
        "model_name": pred.cfg.model.name,
        "symbolic_batch": bool(symbolic_batch),
        "artifacts": (
            {_DYN_KEY: _DYN_NAME}
            if symbolic_batch
            else {
                _artifact_key(b, bw): _artifact_name(b, bw)
                for b in batch_sizes
                for bw in [None] + buckets
            }
        ),
    }
    if buckets:
        manifest["bucket_widths"] = buckets
        manifest["bucket_margin"] = margin
        manifest["bucket_stride"] = stride
    with open(os.path.join(out_dir, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedPredictor:
    """Run a directory produced by :func:`export_checkpoint`.

    Mirrors ``Predictor.predict_batch``'s contract (chunking, zero-padded
    final chunk, END/PAD trim, string decode) without importing any model
    code — only the data/transform helpers and the serialized executables.
    """

    def __init__(self, manifest: Dict[str, Any], directory: str):
        from img2latex_tpu.data.tokenizer import LaTeXTokenizer
        from img2latex_tpu.utils.profiling import enable_compilation_cache

        # Serving-restart latency: the artifact's StableHLO still XLA-compiles
        # per backend at load; cache it like the live paths do.
        enable_compilation_cache(
            manifest.get("compilation_cache_dir") or "~/.cache/img2latex_tpu/jax"
        )
        self.manifest = manifest
        self.directory = directory
        self.tokenizer = LaTeXTokenizer.from_config(manifest["tokenizer_config"])
        self.symbolic: bool = bool(manifest.get("symbolic_batch", False))
        self.batch_sizes: List[int] = sorted(int(b) for b in manifest["batch_sizes"])
        # Drop-in for serving.InferenceServer, which reads predictor.batch_size
        # as its default coalesce width.
        self.batch_size: int = self.batch_sizes[-1]
        self._calls: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, directory: str) -> "ExportedPredictor":
        with open(os.path.join(directory, MANIFEST_NAME), encoding="utf-8") as f:
            manifest = json.load(f)
        if manifest.get("version") != MANIFEST_VERSION:
            raise ValueError(
                f"Unsupported export manifest version {manifest.get('version')!r} "
                f"(this build reads {MANIFEST_VERSION})"
            )
        return cls(manifest, directory)

    # ------------------------------------------------------------------
    def _call(self, batch: int, width: Optional[int] = None):
        """Deserialize (once) and jit the (batch[, bucket-width]) executable;
        a symbolic-batch artifact has one executable for every batch (jit
        compiles per distinct shape on first use)."""
        key: Any = _DYN_KEY if self.symbolic else _artifact_key(batch, width)
        if key not in self._calls:
            import jax

            path = os.path.join(self.directory, self.manifest["artifacts"][str(key)])
            with open(path, "rb") as f:
                exp = jax.export.deserialize(f.read())
            self._calls[key] = jax.jit(exp.call)
        return self._calls[key]

    def _pick_batch(self, n: int, cap: Optional[int] = None) -> int:
        """Smallest exported batch that fits ``n``, else the largest;
        ``cap`` (when some exported size satisfies it) bounds the choice."""
        sizes = self.batch_sizes
        if cap is not None:
            capped = [b for b in sizes if b <= cap]
            if capped:
                sizes = capped
        for b in sizes:
            if b >= n:
                return b
        return sizes[-1]

    def _prepare_image(self, image: Any, canvas_w: Optional[int] = None) -> np.ndarray:
        # Shared with the live Predictor (data/transforms.prepare_image_u8) so
        # the artifact path preprocesses identically: PIL mode-aware convert,
        # CHW->HWC transpose, ITU-R 601 luma for RGB->gray.
        from img2latex_tpu.data.transforms import prepare_image_u8

        h, w, c = self.manifest["image_shape"]
        return prepare_image_u8(
            image, h, canvas_w or w, c, self.manifest["pad_value"]
        )

    # ------------------------------------------------------------------
    def predict_batch(
        self,
        images: Sequence[Any],
        seed: int = 0,
        return_ids: bool = False,
        batch_size: Optional[int] = None,
    ) -> List[Any]:
        import jax
        import jax.numpy as jnp

        from img2latex_tpu.decoding.decode import trim_host

        h, w, c = self.manifest["image_shape"]
        tok = self.tokenizer

        def _trim_extend(out: List[Any], tokens, n: int) -> None:
            id_lists = trim_host(
                np.asarray(tokens)[:n],
                tok.end_token_id,
                tok.pad_token_id,
                start_id=tok.start_token_id,
            )
            out.extend(id_lists if return_ids else (tok.decode(i) for i in id_lists))

        # Same key schedule as Predictor.predict_batch so a sampling export
        # reproduces the live path token-for-token at equal chunking.
        rng = jax.random.PRNGKey(seed)
        buckets = self.manifest.get("bucket_widths")
        if buckets and not self.symbolic:
            return self._predict_bucketed(images, buckets, rng, return_ids, batch_size)

        # Host prep pipelines against device decode exactly like the live
        # Predictor (shared decode_chunks: dispatch i, prep i+1, fetch i).
        from img2latex_tpu.decoding.decode import decode_chunks

        def make_prep(B, chunk_imgs):
            def prep():
                buf = np.zeros((B, h, w, c), dtype=np.uint8)
                for j, img in enumerate(chunk_imgs):
                    buf[j] = self._prepare_image(img)
                return buf

            return prep

        plan = []
        i = 0
        while i < len(images):
            if self.symbolic:
                # Padding-free: exact chunk shape, capped to bound memory.
                B = min(len(images) - i, batch_size or self.batch_size)
            else:
                B = self._pick_batch(len(images) - i, cap=batch_size)
            n = min(B, len(images) - i)
            plan.append((B, self._call(B), make_prep(B, images[i : i + n]),
                         range(i, i + n)))
            i += n
        results: List[Any] = []
        for idxs, tokens in decode_chunks(plan, rng):
            _trim_extend(results, tokens, len(idxs))
        return results

    def _predict_bucketed(
        self,
        images: Sequence[Any],
        bucket_widths: Sequence[int],
        rng,
        return_ids: bool,
        batch_size: Optional[int],
    ) -> List[Any]:
        """Mirror of ``Predictor._predict_bucketed`` over the serialized
        executables: group inputs by the shared ``assign_bucket`` rule,
        decode each group through its bucket's artifact (encoder cost scales
        with the bucket canvas), reassemble in input order.  One flat
        pipelined plan across all groups (shared ``decode_chunks``), like the
        live path."""
        from img2latex_tpu.data.transforms import assign_bucket
        from img2latex_tpu.decoding.decode import decode_chunks, trim_host

        h, w_full, c = self.manifest["image_shape"]
        tok = self.tokenizer
        margin = int(self.manifest["bucket_margin"])
        stride = int(self.manifest["bucket_stride"])
        groups: Dict[Optional[int], List[int]] = {}
        for idx, img in enumerate(images):
            bw = assign_bucket(img, bucket_widths, h, w_full, stride, margin)
            groups.setdefault(bw, []).append(idx)

        def make_prep(B, canvas_w, chunk_idxs):
            def prep():
                buf = np.zeros((B, h, canvas_w, c), dtype=np.uint8)
                for j, idx in enumerate(chunk_idxs):
                    buf[j] = self._prepare_image(images[idx], canvas_w)
                return buf

            return prep

        plan = []
        for bw, idxs in groups.items():
            canvas_w = w_full if bw is None else bw + margin
            i = 0
            while i < len(idxs):
                B = self._pick_batch(len(idxs) - i, cap=batch_size)
                chunk = idxs[i : i + B]
                i += len(chunk)
                plan.append(((B, bw), self._call(B, bw),
                             make_prep(B, canvas_w, chunk), chunk))
        results: List[Any] = [None] * len(images)
        for chunk, tokens in decode_chunks(plan, rng):
            id_lists = trim_host(
                tokens[: len(chunk)],
                tok.end_token_id,
                tok.pad_token_id,
                start_id=tok.start_token_id,
            )
            for idx, ids in zip(chunk, id_lists):
                results[idx] = ids if return_ids else tok.decode(ids)
        return results

    def predict(self, image: Any, **kwargs) -> Any:
        return self.predict_batch([image], **kwargs)[0]
