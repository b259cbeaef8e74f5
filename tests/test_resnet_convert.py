"""torchvision->flax ResNet weight conversion: mapping + load correctness.

torchvision isn't installed here, so the test synthesizes a state dict with
torchvision's exact key naming for resnet18 and checks that every converted
tensor lands at the right flax path with the right layout.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "scripts")

from img2latex_tpu.models.pretrained import (  # noqa: E402
    convert_state_dict,
    load_converted_resnet,
    map_torch_key,
)

from img2latex_tpu.models.encoder import ResNetEncoder  # noqa: E402


def synth_resnet18_state_dict():
    """State dict with torchvision resnet18 naming and shapes (random)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.array(100)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 128, 256, 512]
    for s, c in enumerate(channels, start=1):
        in_c = 64 if s == 1 else channels[s - 2]
        for b in range(2):
            cin = in_c if b == 0 else c
            conv(f"layer{s}.{b}.conv1.weight", c, cin, 3)
            bn(f"layer{s}.{b}.bn1", c)
            conv(f"layer{s}.{b}.conv2.weight", c, c, 3)
            bn(f"layer{s}.{b}.bn2", c)
            if b == 0 and s > 1:
                conv(f"layer{s}.{b}.downsample.0.weight", c, cin, 1)
                bn(f"layer{s}.{b}.downsample.1", c)
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=(1000,)).astype(np.float32)
    return sd


class TestMapping:
    def test_key_mapping(self):
        assert map_torch_key("conv1.weight") == ("conv1/kernel", "conv")
        assert map_torch_key("bn1.running_mean") == ("bn1/mean", "mean")
        assert map_torch_key("layer3.5.conv2.weight") == ("layer3_5/conv2/kernel", "conv")
        assert map_torch_key("layer2.0.downsample.0.weight") == (
            "layer2_0/downsample_conv/kernel",
            "conv",
        )
        assert map_torch_key("layer2.0.downsample.1.bias") == (
            "layer2_0/downsample_bn/bias",
            "bias",
        )
        assert map_torch_key("fc.weight") is None
        assert map_torch_key("bn1.num_batches_tracked") is None

    def test_conv_layout_transposed(self):
        sd = {"conv1.weight": np.arange(64 * 3 * 7 * 7, dtype=np.float32).reshape(64, 3, 7, 7)}
        flat = convert_state_dict(sd)
        assert flat["conv1/kernel"].shape == (7, 7, 3, 64)  # HWIO
        np.testing.assert_array_equal(
            flat["conv1/kernel"][0, 0, 0, :], sd["conv1.weight"][:, 0, 0, 0]
        )


class TestLoadIntoModel:
    def test_full_resnet18_roundtrip(self, tmp_path):
        sd = synth_resnet18_state_dict()
        flat = convert_state_dict(sd)
        npz = tmp_path / "r18.npz"
        np.savez(npz, **flat)

        enc = ResNetEncoder(model_name="resnet18", embedding_dim=32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        loaded = load_converted_resnet(variables, str(npz), backbone_scope=("backbone",))

        # spot checks: stem kernel transposed, BN stats in batch_stats
        got = np.asarray(loaded["params"]["backbone"]["conv1"]["kernel"])
        np.testing.assert_allclose(got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6)
        got_mean = np.asarray(loaded["batch_stats"]["backbone"]["layer2_0"]["bn1"]["mean"])
        np.testing.assert_allclose(got_mean, sd["layer2.0.bn1.running_mean"], atol=1e-6)

        # model still runs with loaded weights
        out = enc.apply(loaded, jnp.ones((1, 64, 64, 3)))
        assert out.shape == (1, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_shape_mismatch_raises(self, tmp_path):
        sd = synth_resnet18_state_dict()
        sd["conv1.weight"] = sd["conv1.weight"][:32]  # wrong shape
        flat = convert_state_dict(sd)
        npz = tmp_path / "bad.npz"
        np.savez(npz, **flat)
        enc = ResNetEncoder(model_name="resnet18", embedding_dim=32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        with pytest.raises(ValueError, match="conv1/kernel"):
            load_converted_resnet(variables, str(npz), backbone_scope=("backbone",))
