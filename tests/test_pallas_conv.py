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


class TestConv1Phase:
    def _ref_bias(self, x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return nn.max_pool(jax.nn.relu(y + b), (2, 2), (2, 2))

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 8, 256, 32),   # W2 == 128: no lane padding
            (1, 8, 100, 32),   # W2 = 50 -> padded to 128
            (2, 16, 300, 16),  # W2 = 150 -> padded to 256; smaller Cout
            (1, 64, 800, 32),  # production conv1 shape
        ],
    )
    def test_matches_xla(self, shape):
        from img2latex_tpu.ops.pallas.conv1_phase import fused_conv1_pool

        B, H, W, Cout = shape
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, Cout)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32)) * 0.1
        ref = self._ref_bias(x, k, b)
        got = fused_conv1_pool(x, k, b, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)

    def test_nchw_layout_matches(self):
        from img2latex_tpu.ops.pallas.conv1_phase import fused_conv1_pool

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 8, 100, 1)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, 16)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32)) * 0.1
        nhwc = fused_conv1_pool(x, k, b, interpret=True, layout="nhwc")
        nchw = fused_conv1_pool(x, k, b, interpret=True, layout="nchw")
        np.testing.assert_array_equal(
            np.asarray(nhwc), np.transpose(np.asarray(nchw), (0, 2, 3, 1))
        )

    def test_rejects_multichannel(self):
        from img2latex_tpu.ops.pallas.conv1_phase import fused_conv1_pool

        with pytest.raises(AssertionError):
            fused_conv1_pool(
                jnp.zeros((1, 8, 16, 3)), jnp.zeros((3, 3, 3, 8)), jnp.zeros((8,)),
                interpret=True,
            )


class TestConv1PhaseEncoderIntegration:
    def _make(self, pallas):
        from img2latex_tpu.models.encoder import CNNEncoder

        return CNNEncoder(
            conv_filters=(8, 16), embedding_dim=32, pallas_conv1=pallas
        )

    def test_same_params_and_output(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 16, 160, 1)).astype(np.float32))
        enc_std = self._make(False)
        enc_pal = self._make("interpret")
        p_std = enc_std.init(jax.random.PRNGKey(0), x)
        p_pal = enc_pal.init(jax.random.PRNGKey(0), x)
        # identical parameter trees (names + shapes + values)
        flat_std = jax.tree_util.tree_leaves_with_path(p_std)
        flat_pal = jax.tree_util.tree_leaves_with_path(p_pal)
        assert [k for k, _ in flat_std] == [k for k, _ in flat_pal]
        for (_, a), (_, b) in zip(flat_std, flat_pal):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_std = enc_std.apply(p_std, x)
        out_pal = enc_pal.apply(p_pal, x)
        np.testing.assert_allclose(np.asarray(out_std), np.asarray(out_pal), atol=1e-4)

    def test_gradients_flow(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 8, 128, 1)).astype(np.float32))
        enc = self._make("interpret")
        params = enc.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(enc.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        conv0 = g["params"]["Conv_0"]
        assert float(jnp.abs(conv0["kernel"]).sum()) > 0
        assert float(jnp.abs(conv0["bias"]).sum()) > 0
        # grads match the standard path's
        enc_std = self._make(False)
        g_std = jax.grad(lambda p: jnp.sum(enc_std.apply(p, x) ** 2))(params)
        a = np.asarray(g["params"]["Conv_0"]["kernel"])
        b = np.asarray(g_std["params"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_cpu_backend_falls_back(self):
        # pallas_conv1=True (not "interpret") on the CPU backend must take
        # the standard XLA path and still work.
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 8, 64, 1)).astype(np.float32))
        enc = self._make(True)
        params = enc.init(jax.random.PRNGKey(2), x)
        out = enc.apply(params, x)
        assert out.shape == (1, 32)

    def test_nhwc_kernel_layout_matches(self):
        from img2latex_tpu.ops.pallas.conv1_phase import fused_conv1_pool

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(2, 8, 100, 1)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 1, 16)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32)) * 0.1
        a = fused_conv1_pool(x, k, b, interpret=True, layout="nhwc")
        c = fused_conv1_pool(x, k, b, interpret=True, layout="nhwc_kernel")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------------
# Channel-first conv chain (ops/pallas/conv_cf.py + encoder pallas_chain)
# ---------------------------------------------------------------------------


class TestConvChainCF:
    @pytest.mark.parametrize(
        "shape",
        [
            (3, 32, 64, 32, 400),   # conv2 at reference scale (Cin, Cout, H, W)
            (2, 64, 128, 16, 200),  # conv3 at reference scale
            (2, 4, 8, 8, 12),       # tiny, W2 < one lane tile
        ],
    )
    def test_block_matches_xla(self, shape):
        from img2latex_tpu.ops.pallas.conv_cf import (
            _xla_convblock_cf,
            fused_convblock_cf,
        )

        B, Cin, Cout, H, W = shape
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(B, Cin, H, W)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
        ref = _xla_convblock_cf(x, k, b)
        got = fused_convblock_cf(x, k, b, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)

    @pytest.mark.parametrize("output", ["vector", "grid"])
    def test_encoder_chain_matches_xla(self, output):
        from img2latex_tpu.models.encoder import CNNEncoder

        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(2, 64, 160, 1)).astype(np.float32))
        ref_enc = CNNEncoder(output=output)
        chain_enc = CNNEncoder(output=output, pallas_chain="interpret")
        params = ref_enc.init(jax.random.PRNGKey(0), x)
        ref = ref_enc.apply(params, x)
        got = chain_enc.apply(params, x)
        assert ref.shape == got.shape
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-4)
        # identical parameter trees in both directions
        shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
        assert shapes(params) == shapes(chain_enc.init(jax.random.PRNGKey(0), x))

    def test_encoder_chain_gradients(self):
        from img2latex_tpu.models.encoder import CNNEncoder

        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=(2, 16, 32, 1)).astype(np.float32))
        enc = CNNEncoder(conv_filters=(4, 8), pallas_chain="interpret")
        enc_std = CNNEncoder(conv_filters=(4, 8))
        params = enc_std.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
        g_std = jax.grad(lambda p: jnp.sum(enc_std.apply(p, x) ** 2))(params)
        for name in ("Conv_0", "Conv_1", "Dense_0"):
            np.testing.assert_allclose(
                np.asarray(g["params"][name]["kernel"]),
                np.asarray(g_std["params"][name]["kernel"]),
                rtol=1e-3,
                atol=1e-3,
            )

    def test_cpu_backend_falls_back(self):
        from img2latex_tpu.models.encoder import CNNEncoder

        x = jnp.zeros((1, 16, 32, 1), jnp.float32)
        enc = CNNEncoder(conv_filters=(4, 8), pallas_chain=True)
        params = enc.init(jax.random.PRNGKey(2), x)
        assert enc.apply(params, x).shape == (1, 512)
