"""On-device image normalization (XLA ops inside the jitted step).

The reference normalizes on host per-image in float32
(``img2latex/data/utils.py:68-80``) and ships float tensors to the device.
TPU-natively we ship uint8 NHWC batches over PCIe/ICI (4-8x less bandwidth)
and fuse the uint8->float conversion + normalization into the compiled step,
where XLA folds it into the first convolution's input transform.

Semantics parity:
  * grayscale (C=1): x/255 * 2 - 1            -> [-1, 1]
  * RGB (C=3):      (x/255 - mean) / std      -> ImageNet statistics
  * grayscale->RGB replication for the ResNet path mirrors
    ``batch_convert_for_resnet`` (``data/utils.py:93-110``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(
    images_u8: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 NHWC -> normalized float NHWC.

    C==1 uses the [-1, 1] grayscale mapping; C==3 uses ``(x/255 - mean)/std``.
    The channel count is static under jit, so this `if` is trace-time.
    """
    x = images_u8.astype(compute_dtype) * (1.0 / 255.0)
    channels = images_u8.shape[-1]
    if channels == 1:
        return x * 2.0 - 1.0
    m = jnp.asarray(mean, dtype=compute_dtype)
    s = jnp.asarray(std, dtype=compute_dtype)
    return (x - m) / s


def grayscale_to_rgb(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) -> (B, H, W, 3) by channel replication; no-op for RGB."""
    if images.shape[-1] == 3:
        return images
    return jnp.repeat(images, 3, axis=-1)
