"""Autopilot teacher: route-following expert used for data collection.

Replaces CARLA's built-in autopilot that generates the reference's training
labels (model/collect_data.py:273-278: autopilot at a 30 km/h target via the
TrafficManager speed-difference trick). Pure-pursuit steering on the planned
route + proportional speed control + obstacle/traffic-light gating; its outputs
are both applied to the ego AND recorded as the behavior-cloning labels
(steer/throttle/brake), exactly as the reference records `vehicle.get_control()`.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.core.geometry import wrap_angle
from cilrs_tpu.maps.network import LIGHT_RED, LIGHT_YELLOW
from cilrs_tpu.maps.routing import Route

TARGET_SPEED_KMH = 30.0  # reference collect_data.py Config.TARGET_SPEED
_PROJ_WINDOW = 6  # segments around route_idx searched for the closest point


def _localize_continuous(route: Route, route_idx: jnp.ndarray, pos: jnp.ndarray):
    """Fractional route position: project pos onto the polyline segments around
    route_idx. Integer-waypoint localization makes pure-pursuit targets (and so
    the steer labels) JUMP each time argmin advances a waypoint; BC inherits
    that jitter as label noise."""
    last = route.length - 1
    cand = jnp.clip(route_idx + jnp.arange(-2, _PROJ_WINDOW), 0, last - 1)
    a = route.xy[cand]
    b = route.xy[jnp.minimum(cand + 1, last)]
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-8)
    t = jnp.clip(jnp.sum((pos - a) * ab, axis=-1) / denom, 0.0, 1.0)
    p = a + t[:, None] * ab
    d2 = jnp.sum((p - pos) ** 2, axis=-1)
    k = jnp.argmin(d2)
    return cand[k].astype(jnp.float32) + t[k]


def _interp_route(route: Route, s: jnp.ndarray) -> jnp.ndarray:
    """Point on the route polyline at fractional index s."""
    last = route.length - 1
    s = jnp.clip(s, 0.0, last.astype(jnp.float32))
    i0 = jnp.floor(s).astype(jnp.int32)
    frac = s - i0.astype(jnp.float32)
    return (route.xy[i0] * (1.0 - frac)
            + route.xy[jnp.minimum(i0 + 1, last)] * frac)


def autopilot_controls(
    route: Route,
    route_idx: jnp.ndarray,
    pos: jnp.ndarray,
    yaw: jnp.ndarray,
    speed_kmh: jnp.ndarray,
    obs_dist: jnp.ndarray,
    tl_state: jnp.ndarray,
    target_speed_kmh: float = TARGET_SPEED_KMH,
):
    """Returns (steer, throttle, brake) in the same ranges the model learns."""
    last = route.length - 1

    # Pure pursuit on a CONTINUOUS lookahead point: fractional localization +
    # interpolated target, so the steer label is a smooth function of pose.
    # Kept short so 90-degree junction arcs are tracked instead of corner-cut
    # (the off-road metric measures distance to the lane centerline).
    s = _localize_continuous(route, route_idx, pos)
    lookahead = 2.0 + speed_kmh * 0.08
    target = _interp_route(route, s + lookahead)
    to_t = target - pos
    desired = jnp.arctan2(to_t[1], to_t[0])
    err = wrap_angle(desired - yaw)
    steer = jnp.clip(err * 1.2, -1.0, 1.0)

    # Upcoming-turn awareness: slow to intersection speed when the route bends
    # (smooth ramp between the 30 km/h cruise and the 18 km/h turn speed).
    i = jnp.floor(s).astype(jnp.int32)
    ahead_yaw = route.yaw[jnp.minimum(i + 6, last)]
    bend = jnp.abs(wrap_angle(ahead_yaw - route.yaw[jnp.minimum(i, last)]))
    turn_w = jnp.clip((bend - 0.15) / 0.3, 0.0, 1.0)
    target_speed_kmh = target_speed_kmh * (1.0 - turn_w) + 18.0 * turn_w

    # Speed control: one CONTINUOUS proportional law through the cruise point
    # (like TM's smooth PID). A piecewise law with a jump at v_err=0 makes the
    # labels oscillate between two throttle values for near-identical
    # observations — behavior cloning then regresses to their mean and the
    # throttle correlation collapses.
    v_err = (target_speed_kmh - speed_kmh) / jnp.maximum(target_speed_kmh, 1.0)
    throttle = jnp.clip(0.45 + v_err * 0.9, 0.0, 0.75)
    brake = jnp.clip(-(v_err + 0.12) * 1.5, 0.0, 0.6)

    # Slow for curves: ease off smoothly as heading error grows (the corner is
    # visible in the frame, so a smooth ramp stays learnable).
    corneriness = jnp.clip((jnp.abs(err) - 0.2) * 5.0, 0.0, 1.0)
    fast = jnp.clip((speed_kmh - 14.0) / 8.0, 0.0, 1.0)
    throttle = throttle * (1.0 - corneriness * fast)
    brake = jnp.maximum(brake, jnp.clip((jnp.abs(err) - 0.5) * 2.0, 0.0, 1.0) * 0.3)

    # Obstacle gating: comfortable SMOOTH stop behind leaders — throttle ramps
    # out across [hard, slow] and brake ramps in with penetration of the hard
    # zone. Step functions at zone boundaries put jump discontinuities in the
    # labels right where the ego hovers when following a lead.
    speed_factor = jnp.maximum(1.0, speed_kmh / 15.0)
    hard = 8.0 * speed_factor
    slow = 16.0 * speed_factor
    gap = jnp.clip((obs_dist - hard) / jnp.maximum(slow - hard, 0.1), 0.0, 1.0)
    throttle = throttle * gap
    pen = jnp.clip(1.0 - obs_dist / jnp.maximum(hard, 0.1), 0.0, 1.0)
    brake = jnp.maximum(brake, pen * 1.2)

    # Traffic lights: stop on red, and on yellow when still slow enough.
    red = tl_state == LIGHT_RED
    yellow_stop = (tl_state == LIGHT_YELLOW) & (speed_kmh < 30.0)
    gate = red | yellow_stop
    throttle = jnp.where(gate, 0.0, throttle)
    brake = jnp.where(gate, 0.8, brake)

    return steer, jnp.clip(throttle, 0.0, 1.0), jnp.clip(brake, 0.0, 1.0)
