"""Image ops: preprocessing parity and augmentation sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.ops.image import (
    IMAGENET_MEAN, IMAGENET_STD, augment_batch, normalize, preprocess_frame,
    resize_frame,
)


def test_normalize_imagenet():
    x = jnp.full((4, 4, 3), 0.5)
    out = np.asarray(normalize(x))
    expect = (0.5 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-6)


def test_preprocess_uint8_resizes():
    img = jnp.zeros((600, 800, 3), jnp.uint8)
    out = preprocess_frame(img)
    assert out.shape == (88, 200, 3)
    # Zero pixels map to -mean/std.
    np.testing.assert_allclose(
        np.asarray(out[0, 0]),
        -np.asarray(IMAGENET_MEAN) / np.asarray(IMAGENET_STD), rtol=1e-5,
    )


def test_resize_batched():
    imgs = jnp.ones((2, 600, 800, 3))
    out = resize_frame(imgs)
    assert out.shape == (2, 88, 200, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_augment_batch_properties():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(0.2, 0.8, (8, 32, 64, 3)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(0), imgs)
    a = np.asarray(out)
    assert a.shape == imgs.shape
    assert a.min() >= 0.0 and a.max() <= 1.0
    # Augmentation changes at least some images, but not into garbage.
    diff = np.abs(a - np.asarray(imgs)).mean(axis=(1, 2, 3))
    assert (diff > 1e-4).any()
    assert np.isfinite(a).all()
    # Deterministic under the same key.
    out2 = augment_batch(jax.random.PRNGKey(0), imgs)
    np.testing.assert_allclose(a, np.asarray(out2))
    # Different under a different key.
    out3 = augment_batch(jax.random.PRNGKey(1), imgs)
    assert np.abs(np.asarray(out3) - a).max() > 1e-4
