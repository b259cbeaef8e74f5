"""img2latex_tpu.utils subpackage."""
