"""img2latex_tpu.data subpackage."""
