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
host path's magnitudes.  One difference from the host path is documented
rather than hidden: the device warp acts on the final H×W canvas (post
resize/pad), the host path on the raw image before canvas geometry; since
the canvas padding is the same white as the warp fill, the two differ only
in edge interpolation details.

Two formulations:

``warp_affine`` (gather)
    The direct inverse-map bilinear warp — 4 ``jnp.take`` taps per pixel.
    Numerically the cleanest, but TPU gathers fetch 1-element rows: measured
    **311 ms** at B=128 on a v5e (``scripts/probe_augment.py``, 2026-08-18)
    against a 20.5 ms train step.  Kept as the test oracle.

``augment_batch`` (3-shear, roll+select — the default)
    Rotation decomposed into three 1-D fractional shifts (Paeth shears,
    ``Sx(−tan θ/2) · Sy(sin θ) · Sx(−tan θ/2)``, translation folded into the
    first two passes).  Each pass is a per-row (or per-column) integer
    circular shift + linear interpolation.  The probe showed ``jnp.roll`` +
    ``jnp.where`` select chains are nearly free next to any gather (the
    one remaining gather pass dominated a 135 ms variant), so every pass
    here is rolls + masks only — **zero gathers**.  Large shift spans are
    decomposed coarse/fine (k = 8·q + r): one select chain over rolls of
    8·q, then one over r ∈ [0..8] (r and r+1 for the interpolation taps).
    Measured on a v5e (2026-08-18): **5.3 ms** standalone at B=128 (52×
    the gather warp), and fused into the train step it costs 1.7 ms —
    22.2 vs 20.5 ms/step (``bench_train.py 128 --augment``), i.e. augmented
    training is 1.08× the plain step instead of 13×.

Interpolation note: three chained 1-D lerps smooth slightly more than one
2-D bilinear tap and the shear decomposition is exact only as θ → 0; at 5°
the two agree to a few gray levels on smooth images (tested).  For
augmentation this is immaterial — both are valid resamplings of the same
affine map.

All shapes are static; everything is VPU-friendly elementwise/roll work and
the per-image parameters ride broadcast masks, so the whole thing fuses
into the surrounding jitted step.
"""

from __future__ import annotations

import math

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
    then translate by (tx, ty) pixels; bilinear, constant ``fill`` outside.

    Gather-based direct warp — the numerical oracle for the roll-based
    production path below.  Do not call in hot paths (see module docstring).
    """
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


# ---------------------------------------------------------------------------
# Roll+select fractional shifts (the production path)
# ---------------------------------------------------------------------------


def _select_rolls(img: jnp.ndarray, k: jnp.ndarray, axis: int, kmin: int, kmax: int):
    """Per-row/column integer *circular* shift via rolled copies + masks.

    ``out[.., j, ..] = img[.., (j + k) % size, ..]`` along ``axis``, where
    ``k`` (int32) broadcasts against ``img`` with the shifted axis of size 1
    (e.g. (B, H, 1, 1) for axis=2).  ``k`` must lie in [kmin, kmax] — static
    bounds derived from the augmentation magnitudes.  Returns the pair
    ``(shift-by-k, shift-by-(k+1))`` — both interpolation taps from one set
    of rolls.  Spans wider than 12 use the coarse/fine 8·q + r decomposition
    (two chained circular shifts compose exactly).
    """
    span = kmax - kmin + 1
    if span <= 12:
        out0 = jnp.zeros_like(img)
        out1 = jnp.zeros_like(img)
        rolled = {s: jnp.roll(img, -s, axis=axis) for s in range(kmin, kmax + 2)}
        for s in range(kmin, kmax + 1):
            out0 = jnp.where(k == s, rolled[s], out0)
            out1 = jnp.where(k == s, rolled[s + 1], out1)
        return out0, out1

    # Coarse: c = kmin + 8q covering [kmin, kmax]; residual r = k - c in [0, 7].
    nq = -(-span // 8)  # ceil
    q = (k - kmin) // 8
    tmp = jnp.zeros_like(img)
    for qi in range(nq):
        tmp = jnp.where(q == qi, jnp.roll(img, -(kmin + 8 * qi), axis=axis), tmp)
    r = k - (kmin + 8 * q)
    out0 = jnp.zeros_like(img)
    out1 = jnp.zeros_like(img)
    fine = {s: jnp.roll(tmp, -s, axis=axis) for s in range(0, 9)}
    for s in range(0, 8):
        out0 = jnp.where(r == s, fine[s], out0)
        out1 = jnp.where(r == s, fine[s + 1], out1)
    return out0, out1


def _shift_x(img: jnp.ndarray, d: jnp.ndarray, dmax: float, fill: float) -> jnp.ndarray:
    """Fractional shift along W: ``out[b,h,x] = img[b,h,x+d[b,h]]`` (bilinear,
    ``fill`` outside).  ``d`` is (B, H); |d| <= dmax (static)."""
    b, h, w, c = img.shape
    kmin, kmax = -int(math.ceil(dmax)), int(math.floor(dmax))
    k2 = jnp.floor(d).astype(jnp.int32)
    k2 = jnp.clip(k2, kmin, kmax)
    frac = (d - jnp.floor(d))[:, :, None, None]
    k = k2[:, :, None, None]
    out0, out1 = _select_rolls(img, k, 2, kmin, kmax)
    lane = jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
    src0 = lane + k
    out0 = jnp.where((src0 >= 0) & (src0 < w), out0, fill)
    out1 = jnp.where((src0 + 1 >= 0) & (src0 + 1 < w), out1, fill)
    return out0 * (1.0 - frac) + out1 * frac


def _shift_y(img: jnp.ndarray, d: jnp.ndarray, dmax: float, fill: float) -> jnp.ndarray:
    """Fractional shift along H: ``out[b,y,w] = img[b,y+d[b,w],w]``.
    ``d`` is (B, W); |d| <= dmax (static)."""
    b, h, w, c = img.shape
    kmin, kmax = -int(math.ceil(dmax)), int(math.floor(dmax))
    k2 = jnp.floor(d).astype(jnp.int32)
    k2 = jnp.clip(k2, kmin, kmax)
    frac = (d - jnp.floor(d))[:, None, :, None]
    k = k2[:, None, :, None]
    out0, out1 = _select_rolls(img, k, 1, kmin, kmax)
    row = jnp.arange(h, dtype=jnp.int32)[None, :, None, None]
    src0 = row + k
    out0 = jnp.where((src0 >= 0) & (src0 < h), out0, fill)
    out1 = jnp.where((src0 + 1 >= 0) & (src0 + 1 < h), out1, fill)
    return out0 * (1.0 - frac) + out1 * frac


def warp_shear3_batch(
    images: jnp.ndarray,
    theta: jnp.ndarray,
    tx: jnp.ndarray,
    ty: jnp.ndarray,
    fill: float,
    max_rotate_deg: float,
    max_translate_frac: float,
) -> jnp.ndarray:
    """(B, H, W, C) batch rotate-about-center + translate via three roll-based
    shear passes.  ``theta``/``tx``/``ty`` are (B,) device arrays; the *max*
    magnitudes are static Python floats that bound the roll spans."""
    b, h, w, c = images.shape
    f = images.astype(jnp.float32)
    # Match warp_affine's map exactly: its source coords are
    #   sx = cos·x̂ + sin·ŷ + cx − (cos·tx + sin·ty)
    #   sy = −sin·x̂ + cos·ŷ + cy + (sin·tx − cos·ty)
    # The Paeth composition Sx(a)·Sy(s)·Sx(a) with a = tan(θ/2), s = −sin θ
    # reproduces that rotation; the translation enters pass 1 (x) and pass 2
    # (y) in the *rotated* frame, so pre-rotate (tx, ty) into (tx', ty').
    a = jnp.tan(theta * 0.5)
    s = -jnp.sin(theta)
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    typ = cos * ty - sin * tx
    txp = cos * tx + sin * ty - a * typ
    ys = jnp.arange(h, dtype=jnp.float32)[None, :] - (h - 1) * 0.5  # (1, H)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - (w - 1) * 0.5  # (1, W)

    r = math.radians(max_rotate_deg)
    shear_x_max = math.tan(r * 0.5) * (h - 1) * 0.5
    shear_y_max = math.sin(r) * (w - 1) * 0.5
    t_x_max = max_translate_frac * w + math.sin(r) * max_translate_frac * h
    t_y_max = max_translate_frac * h + math.sin(r) * max_translate_frac * w
    t_x_max += math.tan(r * 0.5) * t_y_max

    f = _shift_x(f, a[:, None] * ys - txp[:, None], shear_x_max + t_x_max, fill)
    f = _shift_y(f, s[:, None] * xs - typ[:, None], shear_y_max + t_y_max, fill)
    f = _shift_x(f, a[:, None] * ys, shear_x_max, fill)
    return f


def augment_batch(
    images: jnp.ndarray,
    rng: jax.Array,
    max_rotate_deg: float = 5.0,
    max_translate_frac: float = 0.02,
    fill: float = 255.0,
    method: str = "shear_roll",
) -> jnp.ndarray:
    """(B, H, W, C) uint8/float -> float32 randomly rotated+translated batch.

    Magnitudes mirror ``data/transforms.py::augment_image`` (and the
    reference's declared RandomRotation(5)+RandomAffine(0.02)).  Pixel
    values stay in the raw 0-255 domain; callers normalize afterwards.

    ``method``: "shear_roll" (default — gather-free 3-shear, the TPU path)
    or "gather" (direct bilinear warp, the oracle; ~60x slower on chip).
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
    if method == "shear_roll":
        return warp_shear3_batch(
            images, theta, tx, ty, fill, max_rotate_deg, max_translate_frac
        )
    if method == "gather":
        return jax.vmap(warp_affine, in_axes=(0, 0, 0, 0, None))(
            images, theta, tx, ty, fill
        )
    raise ValueError(f"unknown augment method {method!r}")
