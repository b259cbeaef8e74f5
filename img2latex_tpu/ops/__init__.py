"""img2latex_tpu.ops subpackage."""
