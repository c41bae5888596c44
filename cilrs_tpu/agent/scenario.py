"""Scenario setup: spawn ego, NPC traffic, and pedestrians on a road network.

Host-side (episode boundary, not hot path), replacing the reference's actor
spawning: ego Tesla with retry (model/autonomous_drive.py:583-603), NPC vehicles
skipping spawns within 30 m of ego (:715-788, TrafficManager at 30% speed
reduction of the 30 km/h urban flow), and walkers at random nav locations with
1-2 m/s targets (:790-843).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cilrs_tpu.core.state import make_world
from cilrs_tpu.maps.network import LANE_WIDTH, SIDEWALK_WIDTH, RoadNetwork

NPC_MIN_DIST_FROM_EGO = 30.0
NPC_TARGET_SPEED_KMH = 30.0 * 0.7  # TM 30% speed reduction (reference :733-736)


def spawn_world(
    net: RoadNetwork,
    num_vehicles: int,  # total incl. ego
    num_pedestrians: int,
    rng: np.random.RandomState,
    ego_spawn: int | None = None,  # spawn-point index (reference --spawn flag)
    weather_idx: int = 0,
    seed: int = 0,
    return_info: bool = False,
):
    from cilrs_tpu.maps.network import host_arrays

    h = host_arrays(net)
    spawns = h.spawn_wp
    wp_xy = h.wp_xy
    wp_yaw = h.wp_yaw

    if ego_spawn is None:
        ego_spawn = int(rng.randint(len(spawns)))
    ego_wp = int(spawns[ego_spawn % len(spawns)])
    ego_pos = wp_xy[ego_wp]

    world = make_world(num_vehicles, num_pedestrians,
                       rng=jnp.asarray(jnp.array(np.asarray(
                           np.random.RandomState(seed).randint(0, 2**31, 2, dtype=np.int64),
                           np.uint32))),
                       weather_idx=weather_idx)

    # --- ego ---
    veh_pos = np.zeros((num_vehicles, 2), np.float32)
    veh_yaw = np.zeros((num_vehicles,), np.float32)
    veh_wp = np.zeros((num_vehicles,), np.int32)
    veh_alive = np.zeros((num_vehicles,), bool)
    veh_target = np.full((num_vehicles,), NPC_TARGET_SPEED_KMH / 3.6, np.float32)
    veh_pos[0] = ego_pos
    veh_yaw[0] = wp_yaw[ego_wp]
    veh_wp[0] = ego_wp
    veh_alive[0] = True

    # --- NPC vehicles: unique spawn points, >= 30 m from ego ---
    far = np.linalg.norm(wp_xy[spawns] - ego_pos, axis=1) >= NPC_MIN_DIST_FROM_EGO
    candidates = spawns[far]
    rng.shuffle(candidates)
    n_npc = min(num_vehicles - 1, len(candidates))
    for i in range(n_npc):
        wp = int(candidates[i])
        veh_pos[i + 1] = wp_xy[wp]
        veh_yaw[i + 1] = wp_yaw[wp]
        veh_wp[i + 1] = wp
        veh_alive[i + 1] = True
        veh_target[i + 1] = (NPC_TARGET_SPEED_KMH * rng.uniform(0.85, 1.15)) / 3.6

    # --- pedestrians: on sidewalks beside random waypoints ---
    ped_pos = np.zeros((num_pedestrians, 2), np.float32)
    ped_yaw = rng.uniform(-np.pi, np.pi, num_pedestrians).astype(np.float32)
    ped_speed = rng.uniform(1.0, 2.0, num_pedestrians).astype(np.float32)
    ped_alive = np.zeros((num_pedestrians,), bool)
    W = wp_xy.shape[0]
    side_off = LANE_WIDTH / 2 + LANE_WIDTH + SIDEWALK_WIDTH / 2
    for p in range(num_pedestrians):
        wp = int(rng.randint(W))
        yaw = wp_yaw[wp]
        right = np.array([np.sin(yaw), -np.cos(yaw)])
        ped_pos[p] = wp_xy[wp] + right * side_off
        ped_alive[p] = True

    world = world.replace(
        veh_pos=jnp.asarray(veh_pos),
        veh_yaw=jnp.asarray(veh_yaw),
        veh_wp=jnp.asarray(veh_wp),
        veh_alive=jnp.asarray(veh_alive),
        veh_target_speed=jnp.asarray(veh_target),
        ped_pos=jnp.asarray(ped_pos),
        ped_yaw=jnp.asarray(ped_yaw),
        ped_speed=jnp.asarray(ped_speed),
        ped_alive=jnp.asarray(ped_alive),
    )
    if return_info:
        return world, {"ego_wp": ego_wp, "ego_spawn": ego_spawn % len(spawns)}
    return world
