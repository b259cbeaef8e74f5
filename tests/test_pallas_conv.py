"""Fused conv+relu+pool kernel: parity with the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from img2latex_tpu.ops.pallas.conv_pool import fused_conv_relu_pool


def _ref(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return nn.max_pool(jax.nn.relu(y), (2, 2), (2, 2))


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 16, 1, 32),   # conv1-like: single input channel
        (2, 8, 16, 32, 64),  # conv2-like
        (1, 16, 32, 64, 128),  # conv3-like
        (1, 16, 32, 3, 8),   # RGB input
    ],
)
def test_matches_xla(shape):
    B, H, W, Cin, Cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32)) * 0.2
    ref = _ref(x, k)
    got = fused_conv_relu_pool(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_rejects_odd_spatial():
    x = jnp.zeros((1, 7, 16, 1))
    k = jnp.zeros((3, 3, 1, 8))
    with pytest.raises(AssertionError):
        fused_conv_relu_pool(x, k, interpret=True)


class TestConv1Lane:
    @pytest.mark.parametrize("shape", [(2, 8, 128), (1, 8, 100), (2, 16, 256)])
    def test_matches_xla(self, shape):
        from img2latex_tpu.ops.pallas.conv1_lane import conv1_lane_relu_pool

        B, H, W = shape
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, 32)).astype(np.float32)) * 0.2
        ref = _ref(x, k)
        got = conv1_lane_relu_pool(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)
