"""Flax ResNet backbone (18/34/50/101/152), NHWC, BatchNorm running stats.

TPU-native reimplementation of the torchvision backbones the reference loads
(``img2latex/model/encoder.py:184-199``).  Architecture matches torchvision
exactly (conv1 7x7/2, maxpool 3x3/2, four stages of basic/bottleneck blocks,
downsample projections), so converted IMAGENET1K_V1 weights drop in via
``scripts/convert_torchvision_resnet.py`` (OIHW->HWIO transpose + BN stat
mapping).  In this offline environment pretrained weights are optional —
``ResNetEncoder`` falls back to He-init when no ``pretrained_path`` is given.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True, "resnet101": True, "resnet152": True}
FEATURE_DIM = {"resnet18": 512, "resnet34": 512, "resnet50": 2048, "resnet101": 2048, "resnet152": 2048}


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        residual = x
        y = conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)
        if self.downsample:
            residual = conv(self.filters, (1, 1), self.strides, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int  # base width; output channels = 4 * filters
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), self.strides, padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            residual = conv(self.filters * 4, (1, 1), self.strides, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Feature extractor up to (and including) layer4; no pool/fc head."""

    model_name: str = "resnet50"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.model_name not in STAGE_SIZES:
            raise ValueError(f"Unknown ResNet variant: {self.model_name}")
        stage_sizes = STAGE_SIZES[self.model_name]
        block_cls: Callable = Bottleneck if BOTTLENECK[self.model_name] else BasicBlock
        expansion = 4 if BOTTLENECK[self.model_name] else 1

        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            (2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        in_channels = 64
        for stage, num_blocks in enumerate(stage_sizes):
            filters = 64 * (2**stage)
            for block in range(num_blocks):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                needs_proj = strides != (1, 1) or in_channels != filters * expansion
                x = block_cls(
                    filters=filters,
                    strides=strides,
                    downsample=needs_proj,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
                in_channels = filters * expansion
        return x


def feature_dim(model_name: str) -> int:
    return FEATURE_DIM[model_name]


def receptive_field(model_name: str) -> int:
    """Theoretical receptive field (pixels, one axis) of a single layer4
    output position: ``RF = 1 + sum((k-1) * jump_in)`` over the conv/pool
    chain, where ``jump_in`` is the product of all earlier strides.  1x1
    convs (bottleneck reductions, downsample shortcuts) add nothing; each
    block's single strided 3x3 doubles the jump for everything after it.

    Used by the aspect-ratio-bucketing margin: a kept feature column's
    pixel window spans ``32*p +- (RF-1)/2`` (strides compose to exactly
    32*p centers — conv1/maxpool/stage-first convs are all symmetric
    SAME-padded), so a white margin of ``ceil(((RF-1)/2)/32)*32`` pixels
    past the content guarantees every kept column sees canvas pixels
    identical to the full-width canvas — bucketed decode stays bit-exact
    (Predictor.bucket_margin_px, tests/test_buckets.py)."""
    stage_sizes = STAGE_SIZES[model_name]
    convs_per_block = 1 if BOTTLENECK[model_name] else 2
    rf, jump = 1, 1
    rf += 6 * jump  # conv1 7x7 stride 2
    jump *= 2
    rf += 2 * jump  # maxpool 3x3 stride 2
    jump *= 2
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            strided = stage > 0 and block == 0
            for conv in range(convs_per_block):
                rf += 2 * jump  # every counted conv is 3x3
                if conv == 0 and strided:
                    jump *= 2
    return rf
