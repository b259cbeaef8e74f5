"""Seq2Seq wrapper: encoder + LSTM decoder, built from config.

Parity with reference ``img2latex/model/seq2seq.py:17-122``: ``model_type``
selects the CNN or ResNet encoder; the teacher-forced forward feeds
``targets[:, :-1]`` and returns logits over the shifted sequence.  Decoding
strategies live in :mod:`img2latex_tpu.decoding` (fully on-device, unlike the
reference's Python loops, ``seq2seq.py:192-298``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from img2latex_tpu.config import Config
from img2latex_tpu.models.decoder import LSTMDecoder
from img2latex_tpu.models.encoder import CNNEncoder, ResNetEncoder
from img2latex_tpu.models.lstm import Carry


class Seq2SeqModel(nn.Module):
    model_type: str  # "cnn_lstm" | "resnet_lstm"
    vocab_size: int
    embedding_dim: int = 512
    hidden_dim: int = 512
    lstm_layers: int = 1
    dropout: float = 0.0
    use_attention: bool = True
    memory_mode: str = "vector"  # "vector" (reference parity) | "grid"
    # CNN encoder
    conv_filters: Tuple[int, ...] = (32, 64, 128)
    kernel_size: int = 3
    pool_size: int = 2
    fused_conv_pool: bool = False  # HBM-saving conv+pool phase decomposition
    pallas_conv1: Any = False  # first-block Pallas kernel (hardware.pallas_conv1)
    pallas_chain: Any = False  # whole-conv-stack channel-first path (hardware.pallas_chain)
    int8_encoder: bool = False  # int8 conv blocks, inference opt-in (hardware.int8_encoder)
    pallas_lstm: bool = False  # whole-sequence training LSTM kernel (hardware.pallas_lstm)
    pallas_lstm_interpret: bool = False  # run that kernel in interpret mode (CPU testing)
    # ResNet encoder
    resnet_name: str = "resnet50"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        if self.model_type == "cnn_lstm":
            self.encoder = CNNEncoder(
                conv_filters=self.conv_filters,
                kernel_size=self.kernel_size,
                pool_size=self.pool_size,
                embedding_dim=self.embedding_dim,
                output=self.memory_mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_pool=self.fused_conv_pool,
                pallas_conv1=self.pallas_conv1,
                pallas_chain=self.pallas_chain,
                int8=self.int8_encoder,
            )
        elif self.model_type == "resnet_lstm":
            self.encoder = ResNetEncoder(
                model_name=self.resnet_name,
                embedding_dim=self.embedding_dim,
                output=self.memory_mode,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        else:
            raise ValueError(f"Unknown model_type: {self.model_type}")
        self.decoder = LSTMDecoder(
            vocab_size=self.vocab_size,
            embedding_dim=self.embedding_dim,
            hidden_dim=self.hidden_dim,
            lstm_layers=self.lstm_layers,
            dropout=self.dropout,
            use_attention=self.use_attention,
            pallas_lstm=self.pallas_lstm,
            pallas_lstm_interpret=self.pallas_lstm_interpret,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    # ------------------------------------------------------------------
    def encode(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (B, H, W, C) float -> memory (B, S, E); S=1 in vector mode."""
        if self.model_type == "resnet_lstm":
            out = self.encoder(images, train=train)
        else:
            out = self.encoder(images)
        if out.ndim == 2:
            out = out[:, None, :]
        return out

    def encode_features(self, images: jnp.ndarray) -> jnp.ndarray:
        """images -> pre-head feature grid (B, H', W', C) — the aspect-ratio
        bucketing split point: the CNN conv stack (CNNEncoder.__call__) or
        the ResNet backbone through layer4 (ResNetEncoder.__call__), eval
        mode (BatchNorm running stats)."""
        return self.encoder(images, features_only=True)

    def encode_from_features(self, features: jnp.ndarray) -> jnp.ndarray:
        """Feature grid (B, H', W', C) -> memory (B, S, E); S=1 vector mode."""
        out = self.encoder(from_features=features)
        if out.ndim == 2:
            out = out[:, None, :]
        return out

    # ------------------------------------------------------------------
    def __call__(
        self, images: jnp.ndarray, target_sequences: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Teacher-forced forward: logits (B, T-1, V) for targets[:, :-1] input
        (predicting targets[:, 1:]), reference ``seq2seq.py:98-122``."""
        memory = self.encode(images, train=train)
        return self.decoder(memory, target_sequences[:, :-1], deterministic=not train)

    # ------------------------------------------------------------------
    def decode_step(
        self,
        memory: jnp.ndarray,
        token: jnp.ndarray,
        carry: Carry,
        mem_proj: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Carry]:
        return self.decoder.decode_step(memory, token, carry, mem_proj=mem_proj)

    def memory_proj(self, memory: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Step-invariant attention memory projection for decode loops —
        compute once per batch, pass to every :meth:`decode_step` call."""
        return self.decoder.memory_proj(memory)

    def init_carry(self, batch_size: int) -> Carry:
        return self.decoder.init_carry(batch_size)


def init_decoder_carry(
    lstm_layers: int, batch_size: int, hidden_dim: int, dtype=jnp.float32
) -> Carry:
    """Pure helper for decode loops that run outside module context."""
    shape = (lstm_layers, batch_size, hidden_dim)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _resolve_pallas_lstm(cfg: Config) -> bool:
    """hardware.pallas_lstm: explicit value wins; None = auto (on for
    SINGLE-device TPU — other backends would only reach debug-speed
    interpret mode, and on a multi-chip mesh the GSPMD partitioning of the
    Mosaic custom call is unverified in this environment, so the sharded
    train path conservatively keeps the XLA scan unless the user opts in)."""
    flag = getattr(cfg.hardware, "pallas_lstm", None)
    if flag is not None:
        return bool(flag)
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def build_model(cfg: Config, vocab_size: int) -> Seq2SeqModel:
    """Construct the flagship model from a :class:`Config`."""
    if cfg.model.name not in ("cnn_lstm", "resnet_lstm"):
        raise ValueError(f"Unknown model_type: {cfg.model.name!r}")
    dtype = jnp.dtype(cfg.hardware.compute_dtype)
    param_dtype = jnp.dtype(cfg.hardware.param_dtype)
    return Seq2SeqModel(
        model_type=cfg.model.name,
        vocab_size=vocab_size,
        embedding_dim=cfg.model.embedding_dim,
        hidden_dim=cfg.model.decoder.hidden_dim,
        lstm_layers=cfg.model.decoder.lstm_layers,
        dropout=cfg.model.decoder.dropout,
        use_attention=cfg.model.decoder.attention,
        memory_mode=getattr(cfg.model, "memory", "vector"),
        conv_filters=tuple(cfg.model.encoder.cnn.conv_filters),
        kernel_size=cfg.model.encoder.cnn.kernel_size,
        pool_size=cfg.model.encoder.cnn.pool_size,
        fused_conv_pool=cfg.hardware.fused_conv_pool,
        pallas_conv1=getattr(cfg.hardware, "pallas_conv1", False),
        pallas_chain=getattr(cfg.hardware, "pallas_chain", False),
        int8_encoder=getattr(cfg.hardware, "int8_encoder", False),
        pallas_lstm=_resolve_pallas_lstm(cfg),
        pallas_lstm_interpret=getattr(cfg.hardware, "pallas_interpret", False)
        or jax.default_backend() != "tpu",
        resnet_name=cfg.model.encoder.resnet.model_name,
        dtype=dtype,
        param_dtype=param_dtype,
    )
