"""Probe: TPU cost of the on-device augmentation warp, four formulations.

The shipped ``ops/augment.py`` warp (flat 1-element-row gather x 4 taps)
measured 246 ms of a 20.5 ms train step at B=128 (bench_train.py --augment,
2026-08-18) — the gather fetches 51,200 single-element rows per tap per
image.  Candidates:

  flat     — shipped formulation (baseline)
  mapc     — jax.scipy.ndimage.map_coordinates order-1
  shear3   — exact 3-shear rotation (Sx Sy Sx) + translate, each pass a
             1-D lerp via take_along_axis along one axis
  roll5    — shear3 but the two x-passes via rolled-copies + row masks
             (integer x-shifts span only ~[-3, 3] at 5 deg on H=64) and the
             y-pass via take_along_axis

Usage: python scripts/probe_augment.py [B] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

H, W, C = 64, 800, 1


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from img2latex_tpu.ops.augment import augment_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(B, H, W, C), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    r = jnp.deg2rad(5.0)

    def params(key):
        k1, k2, k3 = jax.random.split(key, 3)
        theta = jax.random.uniform(k1, (B,), minval=-r, maxval=r)
        tx = jax.random.uniform(k2, (B,), minval=-0.02, maxval=0.02) * W
        ty = jax.random.uniform(k3, (B,), minval=-0.02, maxval=0.02) * H
        return theta, tx, ty

    # ---- shear passes -----------------------------------------------------
    def shift_x(img_f, d):
        # img_f (B, H, W, C) f32; d (B, H) per-row fractional x-shift.
        x0 = jnp.floor(d)
        frac = (d - x0)[:, :, None, None]
        base = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        idx0 = base + x0.astype(jnp.int32)[:, :, None]  # (B, H, W)
        valid0 = (idx0 >= 0) & (idx0 < W)
        valid1 = (idx0 + 1 >= 0) & (idx0 + 1 < W)
        i0 = jnp.clip(idx0, 0, W - 1)[..., None]
        i1 = jnp.clip(idx0 + 1, 0, W - 1)[..., None]
        v0 = jnp.take_along_axis(img_f, jnp.broadcast_to(i0, img_f.shape), axis=2)
        v1 = jnp.take_along_axis(img_f, jnp.broadcast_to(i1, img_f.shape), axis=2)
        v0 = jnp.where(valid0[..., None], v0, 255.0)
        v1 = jnp.where(valid1[..., None], v1, 255.0)
        return v0 * (1.0 - frac) + v1 * frac

    def shift_y(img_f, d):
        # d (B, W) per-column fractional y-shift.
        y0 = jnp.floor(d)
        frac = (d - y0)[:, None, :, None]
        base = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        idx0 = base + y0.astype(jnp.int32)[:, None, :]  # (B, H, W)
        valid0 = (idx0 >= 0) & (idx0 < H)
        valid1 = (idx0 + 1 >= 0) & (idx0 + 1 < H)
        i0 = jnp.clip(idx0, 0, H - 1)[..., None]
        i1 = jnp.clip(idx0 + 1, 0, H - 1)[..., None]
        v0 = jnp.take_along_axis(img_f, jnp.broadcast_to(i0, img_f.shape), axis=1)
        v1 = jnp.take_along_axis(img_f, jnp.broadcast_to(i1, img_f.shape), axis=1)
        v0 = jnp.where(valid0[..., None], v0, 255.0)
        v1 = jnp.where(valid1[..., None], v1, 255.0)
        return v0 * (1.0 - frac) + v1 * frac

    def shear3(images, key):
        theta, tx, ty = params(key)
        f = images.astype(jnp.float32)
        a = -jnp.tan(theta / 2)
        b = jnp.sin(theta)
        ys = jnp.arange(H, dtype=jnp.float32)[None, :] - (H - 1) * 0.5  # (1,H)
        xs = jnp.arange(W, dtype=jnp.float32)[None, :] - (W - 1) * 0.5  # (1,W)
        f = shift_x(f, a[:, None] * ys - tx[:, None])
        f = shift_y(f, b[:, None] * xs - ty[:, None])
        f = shift_x(f, a[:, None] * ys)
        return f

    def shift_x_rolls(img_f, d):
        # Integer part spans [-3, 3] at 5 deg/2% on H=64 rows: materialize the
        # rolled copies once and select per row (pure VPU, no gather).
        x0 = jnp.floor(d)
        frac = (d - x0)[:, :, None, None]
        x0i = x0.astype(jnp.int32)  # (B, H) in [-3, 2]
        lane = jnp.arange(W, dtype=jnp.int32)[None, None, :, None]
        out0 = jnp.zeros_like(img_f)
        out1 = jnp.zeros_like(img_f)
        for k in range(-3, 4):
            rolled = jnp.roll(img_f, -k, axis=2)
            ook = (lane + k >= 0) & (lane + k < W)
            rolled = jnp.where(ook, rolled, 255.0)
            sel = (x0i == k)[:, :, None, None]
            out0 = jnp.where(sel, rolled, out0)
            sel1 = (x0i + 1 == k)[:, :, None, None]
            out1 = jnp.where(sel1, rolled, out1)
        return out0 * (1.0 - frac) + out1 * frac

    def roll5(images, key):
        theta, tx, ty = params(key)
        f = images.astype(jnp.float32)
        a = -jnp.tan(theta / 2)
        b = jnp.sin(theta)
        ys = jnp.arange(H, dtype=jnp.float32)[None, :] - (H - 1) * 0.5
        xs = jnp.arange(W, dtype=jnp.float32)[None, :] - (W - 1) * 0.5
        f = shift_x_rolls(f, a[:, None] * ys - tx[:, None])
        f = shift_y(f, b[:, None] * xs - ty[:, None])
        f = shift_x_rolls(f, a[:, None] * ys)
        return f

    def mapc(images, key):
        from jax.scipy.ndimage import map_coordinates

        theta, tx, ty = params(key)

        def one(img, th, txi, tyi):
            cy, cx = (H - 1) * 0.5, (W - 1) * 0.5
            yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy - tyi
            xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx - txi
            cos, sin = jnp.cos(th), jnp.sin(th)
            sx = cos * xx + sin * yy + cx
            sy = -sin * xx + cos * yy + cy
            return map_coordinates(
                img[..., 0].astype(jnp.float32), [sy, sx], order=1, mode="constant", cval=255.0
            )[..., None]

        return jax.vmap(one)(images, theta, tx, ty)

    def flat(images, key):
        theta, tx, ty = params(key)
        import img2latex_tpu.ops.augment as aug

        return jax.vmap(aug.warp_affine, in_axes=(0, 0, 0, 0, None))(
            images, theta, tx, ty, 255.0
        )

    def shipped(images, key):
        # The production path: gather-free 3-shear via rolls+selects.
        return augment_batch(images, key, method="shear_roll")

    variants = {
        "flat": flat,
        "mapc": mapc,
        "shear3": shear3,
        "roll5": roll5,
        "shipped": shipped,
    }
    checksum = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    for name, fn in variants.items():
        run = jax.jit(fn)
        try:
            t0 = time.perf_counter()
            out = run(imgs, key)
            s = float(checksum(out))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(iters):
                out = run(imgs, jax.random.fold_in(key, i))
            s = float(checksum(out))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:8s} {dt * 1e3:8.2f} ms/batch  (compile {compile_s:.1f}s, sum {s:.3e})")
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
