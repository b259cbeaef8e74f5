"""img2latex-tpu: TPU-native (JAX/XLA/Pallas/pjit) image-to-LaTeX framework.

Re-exports the public API, mirroring the reference package surface
(``img2latex/__init__.py``) while exposing the TPU-native stack.  Heavy
modules (models, training) import lazily so config/tokenizer use stays light.
"""

__version__ = "0.1.0"

from img2latex_tpu.config import Config, config_from_dict, load_config  # noqa: F401
from img2latex_tpu.data.tokenizer import LaTeXTokenizer  # noqa: F401

__all__ = [
    "Config",
    "config_from_dict",
    "load_config",
    "LaTeXTokenizer",
    "Seq2SeqModel",
    "build_model",
    "Trainer",
    "Predictor",
    "evaluate_checkpoint",
    "create_data_loaders",
    "DecodeConfig",
]


def __getattr__(name):  # lazy heavy imports
    if name in ("Seq2SeqModel", "build_model"):
        from img2latex_tpu.models import seq2seq

        return getattr(seq2seq, name)
    if name == "Trainer":
        from img2latex_tpu.training.trainer import Trainer

        return Trainer
    if name == "Predictor":
        from img2latex_tpu.training.predictor import Predictor

        return Predictor
    if name == "evaluate_checkpoint":
        from img2latex_tpu.training.evaluator import evaluate_checkpoint

        return evaluate_checkpoint
    if name == "create_data_loaders":
        from img2latex_tpu.data.pipeline import create_data_loaders

        return create_data_loaders
    if name == "DecodeConfig":
        from img2latex_tpu.decoding.decode import DecodeConfig

        return DecodeConfig
    raise AttributeError(f"module 'img2latex_tpu' has no attribute {name!r}")
