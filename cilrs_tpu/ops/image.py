"""Image preprocessing and on-device augmentation.

Preprocessing matches the reference inference path
(model/autonomous_drive.py:897-902): resize to 200x88, scale to [0,1],
ImageNet mean/std normalize. Augmentation reproduces the notebook's
Albumentations train-time stack (brightness/contrast, HSV shift, blur, gaussian
noise, coarse dropout) as pure JAX ops, vectorized over the batch so it runs
on-device inside the jitted train step instead of in host DataLoader workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)
TARGET_H, TARGET_W = 88, 200


def resize_frame(img: jnp.ndarray, height: int = TARGET_H, width: int = TARGET_W) -> jnp.ndarray:
    """Bilinear resize [..., H, W, C] -> [..., height, width, C]."""
    out_shape = img.shape[:-3] + (height, width, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), out_shape, method="bilinear")


def normalize(img01: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize an image already in [0, 1]."""
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_frame(img: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """uint8 (0-255) or float (0-1) RGB frame(s) -> normalized float32 NHWC input."""
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    if resize and (img.shape[-3] != TARGET_H or img.shape[-2] != TARGET_W):
        x = resize_frame(x)
    return normalize(jnp.clip(x, 0.0, 1.0))


# ---------------------------------------------------------------------------
# Augmentation (operates on [B, H, W, 3] images in [0, 1], before normalize)
# ---------------------------------------------------------------------------


def _vec_rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn + 1e-8
    h = jnp.where(
        mx == r, (g - b) / diff % 6.0,
        jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0),
    ) / 6.0
    s = diff / (mx + 1e-8)
    return jnp.stack([h % 1.0, s, mx], axis=-1)


def _vec_hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _blur3(img):
    """3x3 box blur via two separable depthwise convolutions."""
    k = jnp.array([0.25, 0.5, 0.25], jnp.float32)
    x = img
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    x = xp[:, :-2] * k[0] + xp[:, 1:-1] * k[1] + xp[:, 2:] * k[2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    x = xp[:, :, :-2] * k[0] + xp[:, :, 1:-1] * k[1] + xp[:, :, 2:] * k[2]
    return x


def augment_batch(
    key: jnp.ndarray,
    images: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    p_brightness_contrast: float = 0.5,
    p_hsv: float = 0.3,
    p_blur: float = 0.2,
    p_noise: float = 0.2,
    p_cutout: float = 0.3,
) -> jnp.ndarray:
    B, H, W, _ = images.shape
    keys = jax.random.split(key, 12)
    x = images

    # Brightness / contrast
    apply_bc = jax.random.uniform(keys[0], (B, 1, 1, 1)) < p_brightness_contrast
    brightness = jax.random.uniform(keys[1], (B, 1, 1, 1), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(keys[2], (B, 1, 1, 1), minval=0.8, maxval=1.2)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    bc = (x - mean) * contrast + mean + brightness
    x = jnp.where(apply_bc, bc, x)

    # HSV jitter
    apply_hsv = jax.random.uniform(keys[3], (B, 1, 1, 1)) < p_hsv
    dh = jax.random.uniform(keys[4], (B, 1, 1), minval=-0.05, maxval=0.05)
    ds = jax.random.uniform(keys[10], (B, 1, 1), minval=0.85, maxval=1.15)
    hsv = _vec_rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    hsv = jnp.stack([(hsv[..., 0] + dh) % 1.0, jnp.clip(hsv[..., 1] * ds, 0, 1), hsv[..., 2]], axis=-1)
    x = jnp.where(apply_hsv, _vec_hsv_to_rgb(hsv), x)

    # Blur
    apply_blur = jax.random.uniform(keys[5], (B, 1, 1, 1)) < p_blur
    x = jnp.where(apply_blur, _blur3(x), x)

    # Gaussian noise
    apply_noise = jax.random.uniform(keys[6], (B, 1, 1, 1)) < p_noise
    noise = jax.random.normal(keys[7], x.shape) * 0.02
    x = jnp.where(apply_noise, x + noise, x)

    # Coarse dropout: one random rectangle per image (up to ~1/5 of each side)
    apply_cut = jax.random.uniform(keys[8], (B, 1, 1, 1)) < p_cutout
    cy = jax.random.uniform(keys[9], (B, 1, 1), minval=0.0, maxval=1.0) * H
    cx = jax.random.uniform(keys[11], (B, 1, 1), minval=0.0, maxval=1.0) * W
    hh = H * 0.1
    ww = W * 0.1
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    inside = (jnp.abs(yy - cy) < hh) & (jnp.abs(xx - cx) < ww)
    x = jnp.where(apply_cut & inside[..., None], 0.0, x)

    return jnp.clip(x, 0.0, 1.0)
