"""img2latex_tpu.parallel subpackage."""
