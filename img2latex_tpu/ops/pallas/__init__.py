"""img2latex_tpu.ops .pallas subpackage."""
