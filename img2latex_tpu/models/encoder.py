"""Image encoders: 3-block CNN and a flax ResNet head.

Capability parity with reference ``img2latex/model/encoder.py``:

* :class:`CNNEncoder` — conv(k=3, same) + ReLU + maxpool(2) per filter size,
  flatten, Dense -> ReLU, emitting a single (B, E) embedding
  (``encoder.py:16-129``).  NHWC layout (TPU-native); flatten order therefore
  differs from torch's NCHW — the torchvision weight converter permutes the
  Dense kernel accordingly.
* :class:`ResNetEncoder` — ResNet-18/34/50/101/152 backbone (see
  ``img2latex_tpu.models.resnet``) + global average pool + Dense -> ReLU
  (``encoder.py:132-249``).  Freezing is an optimizer concern in JAX
  (``img2latex_tpu.training.optim.freeze_mask``), not a module flag.

Both encoders optionally emit a **feature grid** ``(B, S, E)`` instead of a
pooled vector — the natural generalization that makes the decoder's attention
non-degenerate (the reference always pools to one vector, making attention a
constant, ``decoder.py:176,271``).  Default is ``"vector"`` for parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from img2latex_tpu.models.resnet import ResNetBackbone


class CNNEncoder(nn.Module):
    conv_filters: Sequence[int] = (32, 64, 128)
    kernel_size: int = 3
    pool_size: int = 2
    embedding_dim: int = 512
    output: str = "vector"  # "vector" | "grid"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # When on, each conv+relu+maxpool block is computed as
    # relu(max of 4 phase-shifted stride-2 convs) — algebraically identical
    # (max-pool commutes with the monotone relu; each shifted stride-2 conv
    # enumerates one pool phase of the SAME-padded full-res conv) but never
    # materializes the pre-pool full-resolution map in HBM, which is the
    # encoder's bandwidth bottleneck on TPU.  Same parameter tree either way.
    # Requires even H/W at every block and pool_size 2 / kernel_size 3.
    # Measured on a v5e chip (scripts/bench_encoder.py, batch 3072): 0.96x —
    # the four phase maps add up to the same HBM bytes as the pre-pool map,
    # so this only wins if XLA fuses the cross-phase max into the conv
    # epilogues, which it does not on this toolchain.  Kept for parity study.
    fused_pool: bool = False
    # Compute the FIRST conv+relu+pool block (single-channel input) with the
    # phase-split Pallas kernel (ops/pallas/conv1_phase.py) — the pre-pool
    # full-res map never touches HBM.  TPU-only: on other backends the flag
    # is ignored (standard XLA path).  Same parameter tree either way;
    # training-safe (custom VJP).  "interpret" forces the kernel in Pallas
    # interpret mode on any backend (tests).
    pallas_conv1: Any = False  # False | True | "interpret"
    # Channel-first Pallas fast path for the WHOLE conv stack: block 1 via
    # conv1_phase (nchw out), blocks 2..n via ops/pallas/conv_cf.py, then a
    # head whose Dense weights are reshaped from (h,w,c)-major to
    # (c,h,w)-major rows — so the NCHW->NHWC relayout that capped
    # pallas_conv1 at 1.06x (its docstring autopsy) never happens.  Exact
    # same parameter tree and math as the XLA path (weight permutation is a
    # transpose of the packed matrix).  TPU-only when on; "interpret" for
    # tests; training-safe (custom VJPs per block).
    pallas_chain: Any = False  # False | True | "interpret"
    # int8-quantized conv blocks (ops/int8.py): per-channel symmetric weights,
    # per-tensor dynamic activations, int8xint8->int32 conv on the MXU (2x the
    # bf16 rate on v5e).  Numerically approximate (quantization rounding) —
    # an inference-side opt-in; same parameter tree as the f32 path.  Composes
    # with pallas_conv1 (block 0 exact via the kernel, blocks 1..n int8).
    int8: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray = None,
        features_only: bool = False,
        from_features: jnp.ndarray = None,
    ) -> jnp.ndarray:
        """x: (B, H, W, C) float -> (B, E) or (B, S, E) when output="grid".

        ``features_only=True`` returns the pre-head conv feature grid
        (B, H', W'', C); ``from_features`` skips the conv stack and applies
        only the head to a given grid.  Together they support aspect-ratio
        bucketing: narrow buckets run the (width-proportional) conv stack on
        their own canvas, the feature grid is filled back to full width with
        precomputed white-canvas columns, and the head sees exactly the
        full-canvas layout (flax auto-naming keeps the head at ``Dense_0``
        regardless of whether the convs executed, so the param tree is
        unchanged)."""
        if from_features is not None:
            return self._head(from_features)
        x = x.astype(self.dtype)
        n_blocks = len(self.conv_filters)
        chain_interp = self.pallas_chain == "interpret"
        if (
            self.pallas_chain
            and not features_only
            and x.shape[-1] == 1
            and self.kernel_size == 3
            and self.pool_size == 2
            and x.shape[1] % (2**n_blocks) == 0
            and x.shape[2] % (2**n_blocks) == 0
            and (chain_interp or jax.default_backend() in ("tpu", "axon"))
        ):
            return self._chain_path(x, chain_interp)
        fuse = self.fused_pool and self.kernel_size == 3 and self.pool_size == 2
        for block_idx, filters in enumerate(self.conv_filters):
            interpret = self.pallas_conv1 == "interpret"
            if (
                self.pallas_conv1
                and block_idx == 0
                and x.shape[-1] == 1
                and self.kernel_size == 3
                and self.pool_size == 2
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
                # TPU-only (the kernel targets Mosaic; "axon" is the
                # tunneled-TPU plugin's backend name) — NOT just non-cpu,
                # or a GPU backend would crash in lowering.
                and (interpret or jax.default_backend() in ("tpu", "axon"))
            ):
                from img2latex_tpu.ops.pallas.conv1_phase import conv1_pool

                conv = nn.Conv(
                    features=filters,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
                # Register the standard Conv params (identical tree to the
                # XLA path); the dummy call's output is unused and DCE'd.
                _ = conv(x[:1, : self.kernel_size + 1, : self.kernel_size + 1, :])
                kernel = conv.variables["params"]["kernel"]
                bias = conv.variables["params"]["bias"]
                x = conv1_pool(x, kernel.astype(self.dtype), bias, interpret)
                continue
            if self.int8:
                from img2latex_tpu.ops.int8 import conv_block_int8

                conv = nn.Conv(
                    features=filters,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
                # Register the standard Conv params (identical tree to the
                # XLA path); the dummy call's output is unused and DCE'd.
                _ = conv(x[:1, : self.kernel_size + 1, : self.kernel_size + 1, :])
                kernel = conv.variables["params"]["kernel"]
                bias = conv.variables["params"]["bias"]
                x = conv_block_int8(x, kernel, bias, self.pool_size, self.dtype)
                continue
            if fuse and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                conv = nn.Conv(
                    features=filters,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
                pooled = None
                for di in (0, 1):
                    for dj in (0, 1):
                        # Phase (di, dj): conv output at rows 2i+di, cols
                        # 2j+dj of the SAME-padded full-res conv.  One conv
                        # instance called 4x => one shared parameter set.
                        xp = jnp.pad(x, ((0, 0), (1 - di, di), (1 - dj, dj), (0, 0)))
                        y = conv(xp)
                        pooled = y if pooled is None else jnp.maximum(pooled, y)
                x = nn.relu(pooled)
                continue
            x = nn.Conv(
                features=filters,
                kernel_size=(self.kernel_size, self.kernel_size),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x,
                window_shape=(self.pool_size, self.pool_size),
                strides=(self.pool_size, self.pool_size),
            )
        if features_only:
            return x
        return self._head(x)

    def _chain_path(self, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
        """Channel-first conv stack + layout-absorbing head.

        Registers the exact same modules (Conv_0..Conv_{n-1}, Dense_0) as
        the XLA path via dummy calls, then computes with the Pallas kernels
        on NCHW throughout.  The head consumes the NCHW feature order by
        reindexing the Dense kernel (a transpose of the packed weights) —
        output is bit-identical in f32 up to matmul reassociation.
        """
        from img2latex_tpu.ops.pallas.conv1_phase import conv1_pool
        from img2latex_tpu.ops.pallas.conv_cf import convblock_cf

        cin = 1
        for block_idx, filters in enumerate(self.conv_filters):
            conv = nn.Conv(
                features=filters,
                kernel_size=(self.kernel_size, self.kernel_size),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            _ = conv(jnp.zeros((1, 4, 4, cin), self.dtype))  # register; DCE'd
            kernel = conv.variables["params"]["kernel"].astype(self.dtype)
            bias = conv.variables["params"]["bias"]
            if block_idx == 0:
                x = conv1_pool(x, kernel, bias, interpret, "nchw")
            else:
                x = convblock_cf(x, kernel, bias, interpret)
            cin = filters
        B, C, H, W = x.shape
        if self.output == "grid":
            in_features = H * C
        else:
            in_features = H * W * C
        dense = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype)
        _ = dense(jnp.zeros((1, in_features), self.dtype))  # register; DCE'd
        kern = dense.variables["params"]["kernel"].astype(self.dtype)
        dbias = dense.variables["params"]["bias"].astype(self.dtype)
        if self.output == "grid":
            # XLA-path rows are (h*C + c) per column; contract (c, h) directly.
            k3 = kern.reshape(H, C, self.embedding_dim)
            y = jnp.einsum("bchw,hce->bwe", x, k3)
            return nn.relu(y + dbias)
        # XLA-path rows are ((h*W + w)*C + c); reorder to (c, h, w)-major.
        kperm = jnp.transpose(
            kern.reshape(H, W, C, self.embedding_dim), (2, 0, 1, 3)
        ).reshape(C * H * W, self.embedding_dim)
        y = jnp.dot(x.reshape(B, C * H * W), kperm)
        return nn.relu(y + dbias)

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.output == "grid":
            B, H, W, C = x.shape
            # Column-major grid: each of the W' columns becomes a memory slot
            # (reading order of a formula); features = H' x C per column.
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, W, H * C)
            x = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
            return nn.relu(x)
        B = x.shape[0]
        x = x.reshape(B, -1)
        x = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return nn.relu(x)


class ResNetEncoder(nn.Module):
    model_name: str = "resnet50"
    embedding_dim: int = 512
    output: str = "vector"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray = None,
        train: bool = False,
        features_only: bool = False,
        from_features: jnp.ndarray = None,
    ) -> jnp.ndarray:
        """x: (B, H, W, 3) float -> (B, E) or (B, S, E).

        ``features_only`` / ``from_features`` split at the backbone/head
        boundary — the aspect-ratio-bucketing seam, exactly like
        :class:`CNNEncoder`: narrow buckets run the (width-proportional)
        backbone on their own canvas, the layer4 feature grid is filled back
        to full width with precomputed white-canvas columns, and the head
        sees the full-canvas layout (flax auto-names the head ``Dense_0``
        whether or not the backbone executed, so the param tree is
        unchanged)."""
        if from_features is not None:
            return self._head(from_features)
        feats = ResNetBackbone(
            model_name=self.model_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="backbone",
        )(x, train=train)  # (B, H', W', F)
        if features_only:
            return feats
        return self._head(feats)

    def _head(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.output == "grid":
            B, H, W, F = feats.shape
            grid = jnp.transpose(feats, (0, 2, 1, 3)).reshape(B, W, H * F)
            grid = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype)(grid)
            return nn.relu(grid)
        # Global average pool == torch AdaptiveAvgPool2d(1) before the head.
        pooled = jnp.mean(feats, axis=(1, 2))
        out = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype)(pooled)
        return nn.relu(out)
