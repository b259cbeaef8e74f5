"""img2latex_tpu.models subpackage."""
