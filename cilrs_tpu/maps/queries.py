"""Device-side map queries: nearest waypoint, on-road test, texture sampling.

Replaces CARLA's `map.get_waypoint(location, project_to_road=True)` used for the
reference's off-road check (model/autonomous_drive.py:652-665) and teleport
recovery (:1348-1428). All queries are dense argmin/gather ops over the flat
waypoint arrays — no data-dependent control flow, so they vectorize over env
batches and fuse into the jitted world step.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.maps.network import LANE_WIDTH, RoadNetwork

OFF_ROAD_DIST = 3.5  # reference model/autonomous_drive.py:663


def nearest_waypoint(net: RoadNetwork, xy: jnp.ndarray):
    """Nearest waypoint index + distance for point(s) xy [..., 2]."""
    d2 = jnp.sum((xy[..., None, :] - net.wp_xy) ** 2, axis=-1)  # [..., W]
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[..., None], axis=-1))[..., 0]
    return idx.astype(jnp.int32), dist


def nearest_lane_waypoint(net: RoadNetwork, xy: jnp.ndarray):
    """Nearest NON-junction waypoint (the reference projects to Driving lanes)."""
    d2 = jnp.sum((xy[..., None, :] - net.wp_xy) ** 2, axis=-1)
    d2 = jnp.where(net.wp_is_junction, jnp.inf, d2)
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[..., None], axis=-1))[..., 0]
    return idx.astype(jnp.int32), dist


def is_on_road(net: RoadNetwork, xy: jnp.ndarray) -> jnp.ndarray:
    """True if within OFF_ROAD_DIST of a lane centerline (any waypoint)."""
    _, dist = nearest_waypoint(net, xy)
    return dist <= OFF_ROAD_DIST


def sample_texture(net: RoadNetwork, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of the ground-texture masks at world xy [..., 2].

    Returns [..., 3] float32 in [0, 1]: (road, marking, sidewalk).
    """
    uv = (xy - net.tex_origin) / net.tex_scale  # texel coords (x, y)
    x = uv[..., 0]
    y = uv[..., 1]
    TH, TW = net.texture.shape[0], net.texture.shape[1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, TW - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, TH - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    t = net.texture.astype(jnp.float32) / 255.0
    t00 = t[y0, x0]
    t01 = t[y0, x0 + 1]
    t10 = t[y0 + 1, x0]
    t11 = t[y0 + 1, x0 + 1]
    return (t00 * (1 - fx) * (1 - fy) + t01 * fx * (1 - fy)
            + t10 * (1 - fx) * fy + t11 * fx * fy)


def lane_half_width() -> float:
    return LANE_WIDTH / 2.0
