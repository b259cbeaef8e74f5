"""img2latex-tpu: TPU-native (JAX/XLA/Pallas/pjit) image-to-LaTeX framework.

Re-exports the public API, mirroring the reference package surface
(``img2latex/__init__.py``) while exposing the TPU-native stack.
"""

__version__ = "0.1.0"

from img2latex_tpu.config import Config, load_config  # noqa: F401
from img2latex_tpu.data.tokenizer import LaTeXTokenizer  # noqa: F401
