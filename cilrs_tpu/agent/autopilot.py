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

    # Pure pursuit: aim at a speed-scaled lookahead waypoint. Kept short so
    # 90-degree junction arcs are tracked instead of corner-cut (the off-road
    # metric measures distance to the lane centerline).
    lookahead = (2 + (speed_kmh * 0.08)).astype(jnp.int32)
    target = route.xy[jnp.minimum(route_idx + lookahead, last)]
    to_t = target - pos
    desired = jnp.arctan2(to_t[1], to_t[0])
    err = wrap_angle(desired - yaw)
    steer = jnp.clip(err * 1.2, -1.0, 1.0)

    # Upcoming-turn awareness: slow to intersection speed when the route bends.
    ahead_yaw = route.yaw[jnp.minimum(route_idx + 6, last)]
    bend = jnp.abs(wrap_angle(ahead_yaw - route.yaw[jnp.minimum(route_idx, last)]))
    target_speed_kmh = jnp.where(bend > 0.3, 18.0, target_speed_kmh)

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

    # Obstacle gating: comfortable stop behind leaders.
    speed_factor = jnp.maximum(1.0, speed_kmh / 15.0)
    hard = 8.0 * speed_factor
    slow = 16.0 * speed_factor
    throttle = jnp.where(obs_dist < slow, jnp.minimum(throttle, 0.2), throttle)
    throttle = jnp.where(obs_dist < hard, 0.0, throttle)
    brake = jnp.where(
        obs_dist < hard,
        jnp.clip(jnp.maximum(0.4, 1.0 - obs_dist / jnp.maximum(hard, 0.1)), 0.0, 1.0),
        brake,
    )

    # Traffic lights: stop on red, and on yellow when still slow enough.
    red = tl_state == LIGHT_RED
    yellow_stop = (tl_state == LIGHT_YELLOW) & (speed_kmh < 30.0)
    gate = red | yellow_stop
    throttle = jnp.where(gate, 0.0, throttle)
    brake = jnp.where(gate, 0.8, brake)

    return steer, throttle, brake
