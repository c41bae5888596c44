"""Ego perception: traffic lights, obstacles, off-road — as dense vector math.

Reproduces the reference's three per-frame checks:
 - traffic light gating by distance <= 15 m AND heading alignment >= 0.3
   (model/autonomous_drive.py:608-647) so cross-street lights are ignored;
 - obstacle distance with range (0.5, 20] m, forward dot > 0.5, |lateral| <= 2.5 m
   (model/autonomous_drive.py:670-710), over vehicles AND walkers;
 - off-road when > 3.5 m from the nearest driving-lane waypoint
   (model/autonomous_drive.py:652-665).

The reference refreshed an actor cache every 5 frames to cut Python/RPC cost;
here all actors are dense arrays so every frame scans everything for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.config import ObstacleConfig, TrafficLightConfig
from cilrs_tpu.core.geometry import heading_vec
from cilrs_tpu.core.state import WorldState
from cilrs_tpu.maps.network import LIGHT_NONE, RoadNetwork
from cilrs_tpu.maps.queries import nearest_lane_waypoint, OFF_ROAD_DIST

NO_OBSTACLE = 999.0


def check_traffic_light(
    net: RoadNetwork,
    light_state: jnp.ndarray,  # [L]
    pos: jnp.ndarray,  # [2]
    yaw: jnp.ndarray,
    cfg: TrafficLightConfig = TrafficLightConfig(),
) -> jnp.ndarray:
    """State (0 G / 1 Y / 2 R / 3 NONE) of the governing light, if any."""
    if net.num_lights == 0:
        return jnp.asarray(LIGHT_NONE, jnp.int32)
    fwd = heading_vec(yaw)
    to_light = net.light_xy - pos  # [L,2]
    dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1) + 1e-9)
    approach_fwd = heading_vec(net.light_yaw)  # [L,2]
    align = jnp.sum(fwd * approach_fwd, axis=-1)  # same-direction approach
    ahead = jnp.sum(fwd * to_light, axis=-1) > -2.0  # stop line at/ahead of us
    relevant = (dist <= cfg.max_obey_distance_m) & (align >= cfg.heading_dot_threshold) & ahead
    d = jnp.where(relevant, dist, jnp.inf)
    idx = jnp.argmin(d)
    return jnp.where(jnp.isfinite(d[idx]), light_state[idx], LIGHT_NONE).astype(jnp.int32)


def get_obstacle_distance(
    world: WorldState,
    cfg: ObstacleConfig = ObstacleConfig(),
) -> jnp.ndarray:
    """Distance to the nearest actor in the ego's forward corridor (else 999)."""
    pos, yaw = world.ego_pos, world.ego_yaw
    fwd = heading_vec(yaw)

    def corridor_min(actor_pos: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
        rel = actor_pos - pos  # [A,2]
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-9)
        dirn = rel / jnp.maximum(dist[:, None], 1e-6)
        fdot = jnp.sum(dirn * fwd, axis=-1)
        lateral = rel[:, 1] * fwd[0] - rel[:, 0] * fwd[1]  # cross(fwd, rel)
        ok = (
            alive
            & (dist > cfg.min_detection_range_m)
            & (dist <= cfg.max_detection_range_m)
            & (fdot > cfg.forward_dot_threshold)
            & (jnp.abs(lateral) <= cfg.lateral_threshold_m)
        )
        return jnp.min(jnp.where(ok, dist, NO_OBSTACLE))

    d_veh = corridor_min(world.veh_pos[1:], world.veh_alive[1:])
    d_ped = corridor_min(world.ped_pos, world.ped_alive)
    return jnp.minimum(d_veh, d_ped)


def ego_off_road(net: RoadNetwork, pos: jnp.ndarray) -> jnp.ndarray:
    _, dist = nearest_lane_waypoint(net, pos)
    return dist > OFF_ROAD_DIST
