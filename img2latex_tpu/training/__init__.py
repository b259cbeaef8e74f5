"""img2latex_tpu.training subpackage."""
