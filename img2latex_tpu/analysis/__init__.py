"""img2latex_tpu.analysis subpackage."""
