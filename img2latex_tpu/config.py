"""Typed configuration tree for img2latex-tpu.

The reference project threads a raw YAML ``dict`` through every layer and
re-declares defaults as ``None``-fallbacks in each constructor (reference
``img2latex/configs/config.yaml:1-114``, ``img2latex/model/encoder.py:50-64``,
``img2latex/model/decoder.py:48-58``).  Here the schema is a single source of
truth: dataclasses with defaults, a YAML loader that accepts the reference's
config files unchanged, dotted-path CLI overrides, and validation at load time
(the reference validates lazily in ``img2latex/analysis/project.py:85-191``).

TPU-specific additions live under ``hardware`` (mesh axes, dtype policy) —
these have no reference equivalent because the reference is single-device.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml

# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


@dataclass
class DataConfig:
    """Mirrors reference ``config.yaml:4-21``."""

    data_dir: str = "data"
    train_file: str = "im2latex_train_filter.lst"
    validate_file: str = "im2latex_validate_filter.lst"
    test_file: str = "im2latex_test_filter.lst"
    formulas_file: str = "im2latex_formulas.norm.lst"
    img_dir: str = "img"
    batch_size: int = 128
    num_workers: int = 0
    max_seq_length: int = 141
    prefetch_factor: int = 2
    log_frequency: int = 1000
    eval_batch_size_multiplier: int = 2
    max_eval_batch_size: int = 128
    load_in_memory: bool = False
    persistent_workers: bool = True
    pin_memory: bool = False
    # TPU addition: persist the prepared uint8 canvases (post decode/resize/
    # pad) to a memory-mapped .npy per split, keyed by (image dir, sample
    # list, canvas geometry).  The PIL pass is paid ONCE per corpus ever —
    # later trainer/evaluator cache builds and bucketed evals read straight
    # from the mmap (the disk-persistent variant of the reference's
    # load_in_memory preload, dataset.py:166-212).  Skipped for host-side
    # `augment` (per-epoch images); composes with augment_device.
    canvas_cache_dir: Optional[str] = None
    # TPU addition: host-side prefetch depth of device batches.
    device_prefetch: int = 2
    # TPU addition: train-time augmentation (the reference ships augmentation
    # that is dead code, dataset.py:303-318,487-494; here it works, default off).
    augment: bool = False
    # TPU addition: apply the rotation+translation augmentation ON DEVICE,
    # inside the jitted train step (ops/augment.py) — zero host CPU cost and,
    # unlike host-side `augment`, fully compatible with device_cache.
    augment_device: bool = False
    # Warp magnitudes for augment/augment_device (defaults mirror the
    # reference's declared RandomRotation(5)+RandomAffine(0.02),
    # dataset.py:487-494).  CAUTION on wide canvases: a rotation displaces
    # the canvas ends vertically by sin(deg)*W/2 — at the flagship's 64x800
    # canvas 5 degrees moves edge content by +/-35px (half the height) and
    # measurably HURTS (artifacts/augment_flagship_ab).  Bound it so
    # sin(deg)*W/2 stays a small fraction of H, e.g. 0.5-1.0 deg at W=800.
    augment_max_rotate_deg: float = 5.0
    augment_max_translate_frac: float = 0.02
    # TPU addition: keep the whole train split device-resident (uint8 images
    # + token ids in HBM) and gather each batch on device by a per-epoch
    # permutation.  Zero host->device traffic in steady state — removes the
    # per-step dispatch/upload overhead (and, on the tunneled dev platform,
    # its host-RAM transfer leak; see STATUS.md).  Requires augment=false
    # (augmentation is host-side PIL) and the split to fit the HBM budget.
    device_cache: bool = False
    # HBM budget for device_cache, GiB.  None derives it from the device's
    # live memory stats (free HBM minus headroom for params/activations),
    # falling back to 4 GiB train / 2 GiB val when the backend reports none.
    device_cache_budget_gb: Optional[float] = None
    # Store the device cache as 1 grayscale channel even when the model eats
    # 3-channel images (ResNet), tiling channels on device after the batch
    # gather — 3x less HBM.  Exact when the source images are grayscale
    # (all channels equal, e.g. rendered formulas); the fill verifies this
    # per image and falls back to full-channel storage on any violation.
    device_cache_grayscale: bool = False


@dataclass
class CNNEncoderConfig:
    """Mirrors reference ``config.yaml:29-36``."""

    img_height: int = 64
    img_width: int = 800
    channels: int = 1
    conv_filters: List[int] = field(default_factory=lambda: [32, 64, 128])
    kernel_size: int = 3
    pool_size: int = 2
    padding: str = "same"


@dataclass
class ResNetEncoderConfig:
    """Mirrors reference ``config.yaml:38-43``."""

    img_height: int = 64
    img_width: int = 800
    channels: int = 3
    model_name: str = "resnet50"
    freeze_backbone: bool = False
    pretrained_path: Optional[str] = None  # converted torchvision weights (.npz)


@dataclass
class EncoderConfig:
    cnn: CNNEncoderConfig = field(default_factory=CNNEncoderConfig)
    resnet: ResNetEncoderConfig = field(default_factory=ResNetEncoderConfig)


@dataclass
class DecoderConfig:
    """Mirrors reference ``config.yaml:46-50``."""

    hidden_dim: int = 512
    lstm_layers: int = 2
    dropout: float = 0.3
    attention: bool = True


@dataclass
class ModelConfig:
    """Mirrors reference ``config.yaml:24-50``."""

    name: str = "cnn_lstm"  # "cnn_lstm" | "resnet_lstm"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    embedding_dim: int = 512
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    # TPU addition: "vector" pools the encoder to one embedding (reference
    # parity; attention degenerates to a constant); "grid" keeps a feature
    # grid as attention memory — the non-degenerate generalization.
    memory: str = "vector"


@dataclass
class TrainingConfig:
    """Mirrors reference ``config.yaml:53-63`` plus plateau-scheduler keys the
    reference hard-codes (``trainer.py:95-97``: factor 0.5, patience 2)."""

    optimizer: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    epochs: int = 30
    early_stopping_patience: int = 10
    clip_grad_norm: float = 5.0
    save_checkpoint_epochs: int = 5
    save_checkpoint_steps: Optional[int] = None
    experiment_name: str = "img2latex_v1"
    device: str = "tpu"  # informational; JAX picks the backend
    accumulation_steps: int = 1
    label_smoothing: float = 0.1
    lr_plateau_factor: float = 0.5
    lr_plateau_patience: int = 2
    seed: int = 42


@dataclass
class EvaluationConfig:
    """Mirrors reference ``config.yaml:66-71``."""

    metrics: List[str] = field(default_factory=lambda: ["loss", "accuracy", "bleu", "levenshtein"])
    bleu_n: int = 4
    bleu_batches: int = 10
    enhanced_samples: int = 2
    save_basic_metrics: bool = True
    detailed_eval_frequency: int = 1


@dataclass
class InferenceConfig:
    """Mirrors reference ``config.yaml:75-80``."""

    beam_size: int = 0
    max_length: int = 141
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    length_penalty: float = 0.0  # TPU addition: beam length normalization exponent
    # TPU addition: selective beam — decode greedily (whole-decode kernel),
    # then re-decode only this fraction of least-confident rows (lowest mean
    # chosen-token log-prob) with the full beam.  Near-beam BLEU at
    # near-greedy throughput; 0 (or >=1) = plain beam when beam_size > 0.
    selective_beam_frac: float = 0.0
    # Confidence signal the selective gate ranks rows by: "margin" (mean
    # top1-top2 log-prob gap; the measured-best gate on the flagship —
    # selective_signal_ab.json), "logp" (mean chosen-token log-prob),
    # "entropy" (mean negative step entropy), or "margin_logp[:alpha]"
    # (margin + alpha*logp composite, alpha default 1.0 — the r4
    # single-accumulator blend).  All run in-kernel on the Pallas
    # whole-decode paths.
    selective_signal: str = "margin"
    # Stop greedy/sampling decode once every sequence emitted END (the
    # reference's all-finished early break) — output-identical, faster on
    # trained models; routes around the fixed-length Pallas fast path.
    early_exit: bool = False
    # Aspect-ratio buckets (widths at the model height, each a static shape
    # compiled once): narrow images run the conv encoder at bucket width and
    # the feature grid is white-filled to full width — output-identical to
    # the fixed canvas, encoder cost proportional to width.  None = off.
    bucket_widths: Optional[List[int]] = None
    # Whole-split resident decode: when an evaluation has the split in HBM
    # (data.device_cache) and no bucketing, run the ENTIRE split through one
    # lax.map executable — one dispatch + one fetch instead of two host
    # round trips per batch (Predictor._decode_split_fn).  Tokens are
    # identical to the per-batch loop; False forces the per-batch loop.
    whole_split: bool = True


@dataclass
class LoggingConfig:
    """Mirrors reference ``config.yaml:81-87``."""

    level: str = "INFO"
    log_to_file: bool = True
    log_file: str = "train.log"
    use_colors: bool = True
    detailed_eval_frequency: int = 1


@dataclass
class AnalysisConfig:
    """Mirrors reference ``config.yaml:90-103``."""

    error_distance_ranges: List[List[Any]] = field(
        default_factory=lambda: [[0, 0], [1, 1], [2, 3], [4, "inf"]]
    )
    samples_per_bucket: int = 5
    min_edit_distance: int = 1
    max_error_samples: int = 50
    max_bucket_examples: int = 100
    top_error_patterns: int = 5
    image_stats_samples: int = 1000
    curve_smoothing: float = 0.0


@dataclass
class PreprocessingConfig:
    """Mirrors reference ``config.yaml:106-109``."""

    pad_value: int = 255
    normalization_mean: List[float] = field(default_factory=lambda: [0.485, 0.456, 0.406])
    normalization_std: List[float] = field(default_factory=lambda: [0.229, 0.224, 0.225])


@dataclass
class VisualizationConfig:
    """Mirrors reference ``config.yaml:112-114``."""

    figure_size: List[int] = field(default_factory=lambda: [16, 8])
    curve_figure_size: List[int] = field(default_factory=lambda: [10, 6])


@dataclass
class HardwareConfig:
    """TPU-native settings — no reference equivalent (single-device project).

    ``mesh_axes``/``mesh_shape`` describe the device mesh for pjit; ``-1`` in
    ``mesh_shape`` means "all remaining devices".  ``compute_dtype`` is the
    activation dtype policy (bf16 on the MXU); params stay float32.
    """

    mesh_axes: Tuple[str, ...] = ("data", "model")
    mesh_shape: Tuple[int, ...] = (-1, 1)
    # Mesh activation for the product train/eval/predict paths: None = auto
    # (use the mesh whenever >1 device is visible), False = force the plain
    # single-device jit, True = require a mesh (raise if impossible).
    use_mesh: Optional[bool] = None
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    donate_buffers: bool = True
    profile: bool = False
    debug_nans: bool = False
    remat: bool = False
    use_pallas_decode: bool = True
    # Compute each CNN conv+relu+maxpool block as relu(max of 4 phase-shifted
    # stride-2 convs) — algebraically identical, same parameter tree.  Measured
    # on a v5e chip (scripts/bench_encoder.py, batch 3072): 0.96x — the four
    # phase maps cost the same HBM traffic as the full-res pre-pool map, so
    # XLA's standard conv+pool stays the default.
    fused_conv_pool: bool = False
    # First CNN block (Cin=1) via the phase-split Pallas kernel
    # (ops/pallas/conv1_phase.py).  The kernel core beats XLA 3x but the
    # channel-first -> channels-last re-entry costs ~20-25 ms at batch 3072
    # by every measured route, netting 0.85x (full autopsy in the kernel's
    # docstring).  Off by default; TPU-only when on; same param tree;
    # custom VJP makes it training-safe.
    pallas_conv1: bool = False
    # Whole conv stack channel-first (conv1_phase + conv_cf kernels) with a
    # layout-absorbing Dense head — no NCHW->NHWC relayout anywhere.  Off by
    # default (training uses XLA); inference/bench enable it.
    pallas_chain: bool = False
    # int8-quantized CNN conv blocks (ops/int8.py): per-channel symmetric
    # weights + per-tensor dynamic activations, int8xint8->int32 on the MXU
    # (2x the bf16 rate on v5e).  Numerically approximate — inference-side
    # opt-in (Predictor.from_checkpoint(use_int8_encoder=True)); ignored by
    # the training step.  Quality deltas per checkpoint recorded by
    # scripts/ab_pallas_decode.py --int8.
    int8_encoder: bool = False
    # Whole-sequence Pallas LSTM for teacher-forced training forwards
    # (ops/pallas/lstm_train.py: VMEM-resident recurrent weights, custom-VJP
    # backward, f32 gate math + f32 dW_hh accumulation).  None = auto (on
    # when the backend is TPU); the XLA lax.scan path pays ~20 us/step of
    # loop overhead that the kernel eliminates.  Decode paths are separate
    # (use_pallas_decode).
    pallas_lstm: Optional[bool] = None
    # PRNG bit-generator for training randomness (dropout masks).  The JAX
    # default "threefry" is counter-based and splittable but costs real VPU
    # time generating the (B, T, H)-sized dropout masks each step; "rbg"
    # uses the TPU's hardware RNG.  Measured on a v5e chip at reference
    # scale (batch 128, dropout 0.3): 22.8 -> 21.9 ms/step (+4% train
    # throughput).  Keys from different impls coexist safely; "threefry"
    # stays the default for cross-backend reproducibility.
    rng_impl: str = "threefry"
    # Debug/test: run the Pallas decode kernels in interpret mode and skip
    # the TPU-backend gate, so the Predictor's kernel wiring (incl. the
    # sharded shard_map paths) is exercisable on CPU.  Never set in
    # production — interpret mode is orders of magnitude slower.
    pallas_interpret: bool = False
    # Persistent XLA compilation cache directory ("" disables).  Every
    # Trainer / Predictor entry point enables it, so repeated invocations
    # (evaluate sweeps, serving restarts, checkpoint resume) skip the cold
    # compile — on the tunneled TPU a cold fused-decode-kernel compile runs
    # minutes, a cache hit seconds.  The reference has no equivalent (eager
    # torch never compiles); this is the TPU-native restart-latency story.
    compilation_cache_dir: str = "~/.cache/img2latex_tpu/jax"


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    analysis: AnalysisConfig = field(default_factory=AnalysisConfig)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    hardware: HardwareConfig = field(default_factory=HardwareConfig)

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    # ------------------------------------------------------------------
    @property
    def image_shape(self) -> Tuple[int, int, int]:
        """(height, width, channels) for the active model type (NHWC)."""
        enc = self.model.encoder.resnet if self.model.name == "resnet_lstm" else self.model.encoder.cnn
        return (enc.img_height, enc.img_width, enc.channels)


# ---------------------------------------------------------------------------
# Loading / merging
# ---------------------------------------------------------------------------


def _coerce(value: Any, target_type: Any) -> Any:
    """Best-effort coercion of YAML scalars into the annotated type."""
    if value is None:
        return value
    origin = getattr(target_type, "__origin__", None)
    if origin is tuple:
        return tuple(value)
    if target_type is float and isinstance(value, int):
        return float(value)
    return value


def _update_dataclass(obj: Any, data: Dict[str, Any], path: str = "") -> List[str]:
    """Recursively update ``obj`` in place from ``data``; returns unknown keys."""
    unknown: List[str] = []
    fields = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in (data or {}).items():
        if key not in fields:
            unknown.append(f"{path}{key}")
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            unknown.extend(_update_dataclass(current, value, path=f"{path}{key}."))
        else:
            setattr(obj, key, _coerce(value, fields[key].type))
    return unknown


def config_from_dict(data: Dict[str, Any], strict: bool = False) -> Config:
    """Build a :class:`Config` from a (possibly partial) nested dict.

    Unknown keys are ignored by default so that the reference's YAML files
    (which contain keys like ``model.name: resnet_lstm`` and a stray
    ``inference`` block in the middle of ``logging``) load unchanged.
    """
    cfg = Config()
    unknown = _update_dataclass(cfg, data or {})
    if strict and unknown:
        raise ValueError(f"Unknown config keys: {unknown}")
    validate_config(cfg)
    return cfg


def load_config(path: str | Path | None = None, overrides: Dict[str, Any] | None = None) -> Config:
    """Load YAML config (or defaults) and apply dotted-path overrides.

    Equivalent surface to reference ``cli.load_config`` (``cli.py:83-101``)
    plus the per-command option overrides (``cli.py:130-148``), generalized to
    any dotted key, e.g. ``{"training.learning_rate": 3e-4}``.
    """
    data: Dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    cfg = config_from_dict(data)
    for dotted, value in (overrides or {}).items():
        if value is None:
            continue
        set_by_path(cfg, dotted, value)
    validate_config(cfg)
    return cfg


def set_by_path(cfg: Config, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    obj: Any = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    fields = {f.name: f for f in dataclasses.fields(obj)}
    if leaf not in fields:
        raise AttributeError(f"No config field {dotted!r}")
    setattr(obj, leaf, _coerce(value, fields[leaf].type))


def validate_config(cfg: Config) -> None:
    """Schema validation at load time (reference defers this to
    ``analysis/project.py:85-191``)."""
    if cfg.model.name not in ("cnn_lstm", "resnet_lstm"):
        raise ValueError(f"model.name must be cnn_lstm or resnet_lstm, got {cfg.model.name!r}")
    if cfg.model.name == "resnet_lstm":
        valid = ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152")
        if cfg.model.encoder.resnet.model_name not in valid:
            raise ValueError(
                f"encoder.resnet.model_name must be one of {valid}, "
                f"got {cfg.model.encoder.resnet.model_name!r}"
            )
    if cfg.data.max_seq_length < 3:
        raise ValueError("data.max_seq_length must be >= 3 (START + token + END)")
    if cfg.training.accumulation_steps < 1:
        raise ValueError("training.accumulation_steps must be >= 1")
    if not 0.0 <= cfg.training.label_smoothing < 1.0:
        raise ValueError("training.label_smoothing must be in [0, 1)")
    if cfg.inference.beam_size < 0:
        raise ValueError("inference.beam_size must be >= 0")
    _sig = getattr(cfg.inference, "selective_signal", "logp")
    _sig_ok = _sig in ("logp", "margin", "entropy")
    if not _sig_ok and _sig.startswith("margin_logp"):
        # composite form "margin_logp" or "margin_logp:<alpha>"; signal_alpha
        # is strict (exact head, finite alpha — rejects "margin_logpx",
        # "margin_logp:nan"/":inf"), so validity is exactly "it parses".
        try:
            from img2latex_tpu.decoding.decode import signal_alpha

            signal_alpha(_sig)
            _sig_ok = True
        except ValueError:
            _sig_ok = False
    if not _sig_ok:
        raise ValueError(
            "inference.selective_signal must be logp, margin, entropy or "
            f"margin_logp[:alpha], got {cfg.inference.selective_signal!r}"
        )
    if len(cfg.hardware.mesh_axes) != len(cfg.hardware.mesh_shape):
        raise ValueError("hardware.mesh_axes and mesh_shape must have equal length")
