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
from cilrs_tpu.maps.queries import nearest_waypoint, OFF_ROAD_DIST

NO_OBSTACLE = 999.0


def check_traffic_light(
    net: RoadNetwork,
    light_state: jnp.ndarray,  # [L]
    pos: jnp.ndarray,  # [2]
    yaw: jnp.ndarray,
    cfg: TrafficLightConfig = TrafficLightConfig(),
    return_index: bool = False,
):
    """State (0 G / 1 Y / 2 R / 3 NONE) of the governing light, if any.

    With return_index=True also returns the governing light's index (-1 none).
    """
    if net.num_lights == 0:
        state = jnp.asarray(LIGHT_NONE, jnp.int32)
        return (state, jnp.asarray(-1, jnp.int32)) if return_index else state
    fwd = heading_vec(yaw)
    to_light = net.light_xy - pos  # [L,2]
    dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1) + 1e-9)
    approach_fwd = heading_vec(net.light_yaw)  # [L,2]
    align = jnp.sum(fwd * approach_fwd, axis=-1)  # same-direction approach
    # Lane-based gating (CARLA's is_at_traffic_light is lane-aware): the ego
    # must be ON the light's approach lane — behind its stop line (negative
    # longitudinal up to the obey distance, at most 1 m past) and within a lane
    # width laterally. Without this, the far-side approach of a crossed
    # junction (same heading, opposite phase) false-triggers after turns.
    lon = -(to_light[:, 0] * approach_fwd[:, 0] + to_light[:, 1] * approach_fwd[:, 1])
    lat = jnp.abs(to_light[:, 0] * approach_fwd[:, 1] - to_light[:, 1] * approach_fwd[:, 0])
    relevant = (
        (lon >= -cfg.max_obey_distance_m) & (lon <= 1.0)
        & (lat <= 3.0)
        & (align >= cfg.heading_dot_threshold)
    )
    d = jnp.where(relevant, dist, jnp.inf)
    idx = jnp.argmin(d)
    found = jnp.isfinite(d[idx])
    state = jnp.where(found, light_state[idx], LIGHT_NONE).astype(jnp.int32)
    if return_index:
        return state, jnp.where(found, idx, -1).astype(jnp.int32)
    return state


RED_AHEAD_DIST = 40.0  # m — queue-aware red-light lookahead (see below)


def red_light_ahead(
    net: RoadNetwork,
    light_state: jnp.ndarray,  # [L]
    pos: jnp.ndarray,  # [2]
    yaw: jnp.ndarray,
    max_dist: float = RED_AHEAD_DIST,
    cfg: TrafficLightConfig = TrafficLightConfig(),
) -> jnp.ndarray:
    """True if OUR lane's next light within max_dist ahead is RED.

    Red only, deliberately: during the blocking light's 3 s yellow the hold
    drops and the wait clocks restart — benign for the 4 s escalation
    trigger, and simpler than latching through yellow.

    The 15 m obey gate (check_traffic_light) answers "must I stop"; this
    answers "is the queue I'm in light-bound". A vehicle queued 20-40 m
    behind a red never sees the light through the obey gate, so its
    waiting-for-traffic clock runs and, in the reference semantics, escalates
    to overtake-reverse-teleport against a queue that is merely obeying the
    signal (the round-4 benchmark's Clear-run rescues). The escalation clocks
    hold while this is true.
    """
    if net.num_lights == 0:
        return jnp.asarray(False)
    fwd = heading_vec(yaw)
    to_light = net.light_xy - pos  # [L,2]
    approach_fwd = heading_vec(net.light_yaw)  # [L,2]
    align = jnp.sum(fwd * approach_fwd, axis=-1)
    lon = -(to_light[:, 0] * approach_fwd[:, 0] + to_light[:, 1] * approach_fwd[:, 1])
    lat = jnp.abs(to_light[:, 0] * approach_fwd[:, 1] - to_light[:, 1] * approach_fwd[:, 0])
    relevant = (
        (lon >= -max_dist) & (lon <= 1.0)
        & (lat <= 3.0)
        & (align >= cfg.heading_dot_threshold)
    )
    from cilrs_tpu.maps.network import LIGHT_RED

    return jnp.any(relevant & (light_state == LIGHT_RED))


PREDICT_HORIZONS = (0.0, 0.6, 1.2)  # s — crossing-traffic anticipation


def get_obstacle_distance(
    world: WorldState,
    cfg: ObstacleConfig = ObstacleConfig(),
    horizons: tuple = PREDICT_HORIZONS,
) -> jnp.ndarray:
    """Distance to the nearest actor in the ego's forward corridor (else 999).

    On top of the reference's instantaneous corridor, the same test is applied
    at short prediction horizons (positions extrapolated by current velocity):
    that anticipates crossing traffic at junctions, which the reference left to
    CARLA's TrafficManager-side yielding (and to the documented-but-unshipped
    oncoming-traffic filter, SURVEY.md §2.3 item 7).

    Pass horizons=(0.0,) for the instantaneous corridor only — used for the
    TEACHER's labels: extrapolation depends on actor velocities, which a
    single-frame policy cannot observe, so velocity-dependent labels are
    irreducible noise for behavior cloning (the reference's TM teacher also
    gates on instantaneous geometry).
    """
    pos, yaw = world.ego_pos, world.ego_yaw
    fwd = heading_vec(yaw)
    ego_vel = fwd * world.ego_speed

    ts = jnp.asarray(horizons, jnp.float32)[:, None, None]  # [T,1,1]

    def corridor_min(actor_pos, actor_vel, alive) -> jnp.ndarray:
        # All horizons stacked on a leading axis (one dense [T,A] pass instead
        # of a Python loop re-emitting the corridor test T times).
        rel = (actor_pos[None] + actor_vel[None] * ts) \
            - (pos[None, None] + ego_vel[None, None] * ts)  # [T,A,2]
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-9)  # [T,A]
        dirn = rel / jnp.maximum(dist[..., None], 1e-6)
        fdot = jnp.sum(dirn * fwd, axis=-1)
        lateral = rel[..., 1] * fwd[0] - rel[..., 0] * fwd[1]  # cross(fwd, rel)
        ok = (
            alive[None]
            & (dist > cfg.min_detection_range_m)
            & (dist <= cfg.max_detection_range_m)
            & (fdot > cfg.forward_dot_threshold)
            & (jnp.abs(lateral) <= cfg.lateral_threshold_m)
        )
        return jnp.min(jnp.where(ok, dist, NO_OBSTACLE))

    veh_vel = heading_vec(world.veh_yaw[1:]) * world.veh_speed[1:, None]
    ped_vel = heading_vec(world.ped_yaw) * world.ped_speed[:, None]
    d_veh = corridor_min(world.veh_pos[1:], veh_vel, world.veh_alive[1:])
    d_ped = corridor_min(world.ped_pos, ped_vel, world.ped_alive)
    return jnp.minimum(d_veh, d_ped)


def ego_off_road(net: RoadNetwork, pos: jnp.ndarray) -> jnp.ndarray:
    # ALL waypoints including junction connectors: CARLA's Driving-lane
    # projection covers junction lanes too; excluding them would flag every
    # junction crossing as off-road (setbacks are 9 m).
    _, dist = nearest_waypoint(net, pos)
    return dist > OFF_ROAD_DIST
