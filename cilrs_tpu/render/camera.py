"""Pinhole camera model matching the reference's sensor rig.

Reference rig (model/autonomous_drive.py:851-857, collect_data.py:53-58):
RGB camera at body offset (x=+2.0 forward, y=0, z=+1.4 up), FOV 100 degrees,
800x600 native then resized to 200x88 for the network. We render at the network
resolution directly (the extra 27x pixels only existed to be thrown away by
cv2.resize; rendering 200x88 natively preserves the same field of view and
feeds the same model input).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraSpec:
    width: int = 200
    height: int = 88
    fov_deg: float = 100.0
    offset_fwd: float = 2.0
    offset_up: float = 1.4
    pitch_deg: float = 0.0  # negative looks down
    far: float = 150.0

    @property
    def tan_half_fov(self) -> float:
        return math.tan(math.radians(self.fov_deg) / 2.0)


# Third-person spectator rig, parity with the reference's chase-cam placement
# (model/autonomous_drive.py:1612-1622: behind and above the ego, pitched down).
CHASE_CAMERA = CameraSpec(
    width=320, height=180, fov_deg=90.0,
    offset_fwd=-7.5, offset_up=3.2, pitch_deg=-12.0,
)


def ray_directions(spec: CameraSpec, yaw: jnp.ndarray) -> jnp.ndarray:
    """World-frame unit ray directions [H, W, 3] for a camera with heading yaw.

    Axes: x,y world ground plane, z up. The camera looks along the vehicle
    heading with zero pitch; square pixels (vertical extent derives from the
    aspect ratio, matching the 800x600@FOV100 -> 200x88 crop geometry).
    """
    H, W = spec.height, spec.width
    th = spec.tan_half_fov
    # Pixel grid in normalized camera coords: u right, v down.
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0  # [-1, 1]
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0 - 1.0
    # The reference resize squashes 600->88 rows of a FOV-100 X 75deg-v frame;
    # vertical half-extent matches the original camera's 4:3 aspect.
    tv = th * 0.75
    uu, vv = jnp.meshgrid(u * th, v * tv)  # [H, W]

    pitch = math.radians(spec.pitch_deg)
    cp, sp = math.cos(pitch), math.sin(pitch)
    fwd = jnp.stack([jnp.cos(yaw) * cp, jnp.sin(yaw) * cp, jnp.full_like(yaw, sp)])
    right = jnp.stack([jnp.sin(yaw), -jnp.cos(yaw), jnp.zeros_like(yaw)])
    up = jnp.stack([-jnp.cos(yaw) * sp, -jnp.sin(yaw) * sp, jnp.full_like(yaw, cp)])

    d = (fwd[None, None, :]
         + uu[..., None] * right[None, None, :]
         - vv[..., None] * up[None, None, :])
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def camera_position(spec: CameraSpec, ego_pos: jnp.ndarray, ego_yaw: jnp.ndarray) -> jnp.ndarray:
    """World position [3] of the camera for ego at (pos, yaw)."""
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    xy = ego_pos + fwd * spec.offset_fwd
    return jnp.concatenate([xy, jnp.asarray([0.0], jnp.float32) + spec.offset_up])
