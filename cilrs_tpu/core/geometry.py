"""2-D geometry helpers shared by dynamics, perception, rendering, and routing.

Conventions: world frame x-east / y-north, yaw in radians CCW from +x,
all distances in meters, speeds in m/s internally (km/h only at interfaces,
mirroring the reference's `speed_kmh` convention at
reference model/autonomous_drive.py:914-920).
"""

from __future__ import annotations

import jax.numpy as jnp

KMH_TO_MS = 1.0 / 3.6
MS_TO_KMH = 3.6


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def heading_vec(yaw: jnp.ndarray) -> jnp.ndarray:
    """Unit heading vector(s) [..., 2] for yaw [...]."""
    return jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)


def rot2d(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 2, 2] mapping body -> world."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def world_to_body(points: jnp.ndarray, pos: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Transform world points [..., 2] into the body frame at (pos, yaw).

    Body frame: +x forward, +y left.
    """
    d = points - pos
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    fx = d[..., 0] * c + d[..., 1] * s
    fy = -d[..., 0] * s + d[..., 1] * c
    return jnp.stack([fx, fy], axis=-1)


def body_to_world(points: jnp.ndarray, pos: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    wx = points[..., 0] * c - points[..., 1] * s
    wy = points[..., 0] * s + points[..., 1] * c
    return jnp.stack([wx, wy], axis=-1) + pos


def cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Scalar 2-D cross product a.x*b.y - a.y*b.x."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def norm2(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def segment_distance(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Distance from point(s) p [..., 2] to segment(s) (a, b) [..., 2]."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / (jnp.sum(ab * ab, axis=-1) + 1e-9)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return norm2(p - proj)
