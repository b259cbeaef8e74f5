"""On-device train-time augmentation (rotation + translation, bilinear).

The reference declares RandomRotation(5°) + RandomAffine(2% translate) but
its code path is dead (reference ``data/dataset.py:303-318,487-494`` — it
feeds a PIL image where a tensor is expected).  We ship two working
equivalents: a host-side PIL path (``data/transforms.py::augment_image``,
gated by ``data.augment``) and this device path (``data.augment_device``),
which warps the uint8 batch *inside the jitted train step*.  The device path
is the TPU-native one: it costs no host CPU (this class of host is often
1-core), composes with ``data.device_cache`` (the HBM-resident corpus —
host augmentation would force per-step uploads), and the whole
sample→warp→normalize→forward chain stays one XLA program.

Geometry: output = translate(rotate_about_center(img, θ), t) with
θ ~ U(−max_rotate_deg, +max_rotate_deg), t ~ U(−f, f)·(W, H), matching the
host path's magnitudes.  Implemented as the inverse map — for each output
pixel the source coordinate is rotated by −θ — with bilinear sampling and
out-of-bounds pixels set to ``fill`` (the white canvas value).  One
difference from the host path is documented rather than hidden: the device
warp acts on the final H×W canvas (post resize/pad), the host path on the
raw image before canvas geometry; since the canvas padding is the same
white as the warp fill, the two differ only in edge interpolation details.

All shapes are static; the gathers vectorize on the VPU and the per-image
parameters ride a single ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_affine(
    img: jnp.ndarray,
    theta: jnp.ndarray,
    tx: jnp.ndarray,
    ty: jnp.ndarray,
    fill: float,
) -> jnp.ndarray:
    """Rotate one (H, W, C) image by ``theta`` (radians, about the center)
    then translate by (tx, ty) pixels; bilinear, constant ``fill`` outside."""
    h, w, c = img.shape
    cy = (h - 1) * 0.5
    cx = (w - 1) * 0.5
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    # Inverse map: undo the translation, then rotate by -theta about center.
    dx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx - tx
    dy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy - ty
    sx = cos * dx + sin * dy + cx
    sy = -sin * dx + cos * dy + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(h * w, c).astype(jnp.float32)

    def sample(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(h, w, c)
        return jnp.where(valid[..., None], v, fill)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def augment_batch(
    images: jnp.ndarray,
    rng: jax.Array,
    max_rotate_deg: float = 5.0,
    max_translate_frac: float = 0.02,
    fill: float = 255.0,
) -> jnp.ndarray:
    """(B, H, W, C) uint8/float -> float32 randomly rotated+translated batch.

    Magnitudes mirror ``data/transforms.py::augment_image`` (and the
    reference's declared RandomRotation(5)+RandomAffine(0.02)).  Pixel
    values stay in the raw 0-255 domain; callers normalize afterwards.
    """
    b, h, w, _ = images.shape
    k_ang, k_tx, k_ty = jax.random.split(rng, 3)
    r = jnp.deg2rad(max_rotate_deg)
    theta = jax.random.uniform(k_ang, (b,), minval=-r, maxval=r)
    tx = jax.random.uniform(
        k_tx, (b,), minval=-max_translate_frac, maxval=max_translate_frac
    ) * w
    ty = jax.random.uniform(
        k_ty, (b,), minval=-max_translate_frac, maxval=max_translate_frac
    ) * h
    return jax.vmap(warp_affine, in_axes=(0, 0, 0, 0, None))(
        images, theta, tx, ty, fill
    )
