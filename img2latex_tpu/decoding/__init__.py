"""img2latex_tpu.decoding subpackage."""
