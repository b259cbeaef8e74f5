"""Test configuration: force an 8-device virtual CPU platform.

Sharding/pjit tests run against a faked 8-device CPU mesh — the standard JAX
way to test multi-chip code without hardware.  Must be set before JAX import.
"""

import os
import sys

# The environment presets JAX_PLATFORMS=axon (real TPU) and the axon plugin
# overrides the env var, so force the CPU platform via jax.config instead.
# Tests always run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_tokenizer():
    from img2latex_tpu.data.tokenizer import LaTeXTokenizer

    tok = LaTeXTokenizer(max_sequence_length=24)
    tok.default_init()
    return tok
