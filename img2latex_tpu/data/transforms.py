"""Host-side image geometry: aspect-preserving resize to a fixed canvas.

Pixel-exact port of the reference transform semantics
(``img2latex/data/transforms.py:9-56``): LANCZOS resize to target height with
``round()`` width, then right-pad with white (``pad_value``) or center-crop to
the target width.  Geometry runs on host (PIL) because it is per-image and
data-dependent; *normalization* is deliberately NOT done here — it runs
on-device as XLA ops fused into the jitted step (see
``img2latex_tpu.ops.preprocess``), so the host->device transfer is uint8
(4-8x smaller than float32).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

try:  # Pillow >= 9.1
    _LANCZOS = Image.Resampling.LANCZOS
except AttributeError:  # pragma: no cover - older Pillow
    _LANCZOS = Image.LANCZOS


def _pad_fill(img: Image.Image, pad_value: int):
    """Per-band fill color.  The reference passes the bare int 255 to
    ``Image.new`` (``transforms.py:29,44-48``), which PIL interprets on RGB
    images as the packed color 0x0000FF — i.e. RED padding, contradicting
    the reference's own "White padding" comment.  We implement the intent:
    ``pad_value`` replicated across bands (identical on 1-band images)."""
    bands = len(img.getbands())
    return pad_value if bands == 1 else (pad_value,) * bands


def resize_with_aspect_ratio(
    img: Image.Image, target_height: int, target_width: int, pad_value: int = 255
) -> Image.Image:
    """Resize to ``target_height`` preserving aspect ratio, then right-pad
    (white) or center-crop to ``target_width``."""
    width, height = img.size
    if height == 0:
        return Image.new(img.mode, (target_width, target_height), _pad_fill(img, pad_value))
    # max(1, ...): an extremely tall/narrow image can round to width 0, which
    # PIL's resize rejects — clamp to a 1px column instead of crashing.
    new_width = max(1, int(round(target_height * (width / height))))
    img_resized = img.resize((new_width, target_height), _LANCZOS)
    if new_width == target_width:
        return img_resized
    if new_width < target_width:
        padded = Image.new(img.mode, (target_width, target_height), _pad_fill(img, pad_value))
        padded.paste(img_resized, (0, 0))
        return padded
    left = (new_width - target_width) // 2
    return img_resized.crop((left, 0, left + target_width, target_height))


class ResizeWithAspectRatio:
    """Callable/picklable wrapper (same interface as the reference class)."""

    def __init__(self, target_height: int, target_width: int, pad_value: int = 255):
        self.target_height = target_height
        self.target_width = target_width
        self.pad_value = pad_value

    def __call__(self, img: Image.Image) -> Image.Image:
        return resize_with_aspect_ratio(img, self.target_height, self.target_width, self.pad_value)


def augment_image(img: Image.Image, rng: np.random.Generator, pad_value: int = 255,
                  max_rotate_deg: float = 5.0, max_translate_frac: float = 0.02) -> Image.Image:
    """Train-time augmentation: small rotation + translation.

    The reference declares RandomRotation(5) + RandomAffine(2% translate) but
    the code path is dead (``dataset.py:303-318,487-494`` — it would feed a
    PIL image where a tensor is expected).  This is the working equivalent,
    applied on host before the canvas geometry; gated by ``data.augment``
    (default off for reference parity).
    """
    angle = float(rng.uniform(-max_rotate_deg, max_rotate_deg))
    w, h = img.size
    tx = float(rng.uniform(-max_translate_frac, max_translate_frac)) * w
    ty = float(rng.uniform(-max_translate_frac, max_translate_frac)) * h
    out = img.rotate(angle, resample=Image.BILINEAR, expand=False,
                     fillcolor=_pad_fill(img, pad_value), translate=(tx, ty))
    return out


def load_image_u8(
    image_path: str,
    img_size: Tuple[int, int] = (64, 800),
    channels: int = 1,
    pad_value: int = 255,
) -> np.ndarray:
    """Load + geometry-only preprocess to a uint8 NHWC canvas.

    Mirrors the decode/convert/resize part of reference ``data/utils.py:18-66``
    but stops before normalization (done on device) and returns HWC uint8.
    On error, returns a zero canvas (reference parity, ``data/utils.py:84-90``).
    """
    try:
        img = Image.open(image_path)
        if channels == 1 and img.mode != "L":
            img = img.convert("L")
        elif channels == 3 and img.mode != "RGB":
            img = img.convert("RGB")
        target_height, target_width = img_size
        img = resize_with_aspect_ratio(img, target_height, target_width, pad_value)
        arr = np.asarray(img, dtype=np.uint8)
        if channels == 1:
            arr = arr[:, :, None]
        return arr
    except FileNotFoundError:
        raise
    except Exception:
        return np.zeros((img_size[0], img_size[1], channels), dtype=np.uint8)


def rgb_to_gray_u8(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W, 1) uint8 via the ITU-R 601 luma weights —
    the same conversion PIL's ``convert('L')`` applies, so array inputs and
    PIL inputs produce identical grayscale canvases."""
    a = arr.astype(np.float32)
    gray = a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
    return np.clip(gray + 0.5, 0, 255).astype(np.uint8)[..., None]


def prepare_image_u8(
    image, target_height: int, target_width: int, channels: int, pad_value: int = 255
) -> np.ndarray:
    """Any accepted predictor input -> uint8 (H, W, C) canvas.

    The single input-dispatch used by BOTH the live ``Predictor`` and the
    serialized-artifact ``ExportedPredictor`` (reference dispatch:
    ``img2latex/training/predictor.py:396-462``), so the two serving paths
    preprocess identically.  Accepts: a path string, a PIL image (mode-aware
    convert), or an array — uint8/float, HW / HWC / CHW, 1 or 3 channels
    (RGB->gray via ITU-R 601 luma, matching PIL ``convert('L')``).
    """
    h, w, c = target_height, target_width, channels
    if isinstance(image, str):
        return load_image_u8(image, (h, w), c, pad_value)
    if isinstance(image, Image.Image):
        mode = "L" if c == 1 else "RGB"
        if image.mode != mode:
            image = image.convert(mode)
        arr = np.asarray(image, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return array_to_canvas_u8(arr, h, w, pad_value)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        # float in [0,1] or [-1,1] -> back to uint8 canvas
        a = arr.astype(np.float32)
        if a.min() < 0:
            a = (a + 1.0) / 2.0
        arr = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))  # CHW -> HWC
    if arr.shape[2] == 1 and c == 3:
        arr = np.repeat(arr, 3, axis=2)
    if arr.shape[2] == 3 and c == 1:
        arr = rgb_to_gray_u8(arr)
    if arr.shape[:2] != (h, w):
        arr = array_to_canvas_u8(arr, h, w, pad_value)
    return arr


def array_to_canvas_u8(
    arr: np.ndarray, target_height: int, target_width: int, pad_value: int = 255
) -> np.ndarray:
    """Same geometry for an in-memory uint8 array (HW or HWC), via PIL."""
    if arr.ndim == 3 and arr.shape[2] == 1:
        img = Image.fromarray(arr[:, :, 0], mode="L")
        out = resize_with_aspect_ratio(img, target_height, target_width, pad_value)
        return np.asarray(out, dtype=np.uint8)[:, :, None]
    img = Image.fromarray(arr)
    out = resize_with_aspect_ratio(img, target_height, target_width, pad_value)
    res = np.asarray(out, dtype=np.uint8)
    if res.ndim == 2:
        res = res[:, :, None]
    return res


# ---- aspect-bucket assignment (shared by Predictor and ExportedPredictor) --

def natural_size(image) -> "Tuple[int, int] | None":
    """(width, height) of the raw input, or None when unavailable.

    Path strings read only the header (PIL lazy open); arrays use their
    shape (CHW recognized by channel-count heuristics, matching
    ``prepare_image_u8``'s dispatch).
    """
    if isinstance(image, str):
        try:
            with Image.open(image) as im:
                return im.size
        except Exception:
            return None
    if isinstance(image, Image.Image):
        return image.size
    arr = np.asarray(image)
    if arr.ndim in (2, 3):
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            return arr.shape[2], arr.shape[1]  # CHW
        return arr.shape[1], arr.shape[0]
    return None


def assign_bucket(
    image,
    bucket_widths,
    target_height: int,
    full_width: int,
    stride: int,
    margin: int,
) -> "int | None":
    """Smallest bucket whose width fits the height-resized content plus the
    white margin; None = use the standard full canvas.

    The ONE routing rule for aspect-bucketed decode, shared by the live
    ``Predictor._predict_bucketed`` and the serialized-artifact
    ``ExportedPredictor`` so both serving paths bucket identically.  A
    bucket is eligible only if its width is stride-aligned (the conv
    stack's total pooling) and its canvas (``width + margin``) is strictly
    narrower than the full canvas.
    """
    size = natural_size(image)
    if size is None or size[1] == 0:
        return None
    nat_w = int(round(target_height * size[0] / size[1]))
    for bw in sorted(int(b) for b in bucket_widths):
        if bw % stride or bw + margin >= full_width:
            continue
        if nat_w + margin <= bw:
            return bw
    return None
