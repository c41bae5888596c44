"""NPC traffic AI: waypoint-following with spacing and light compliance.

On-device replacement for CARLA's TrafficManager (the reference configures it
with 3.0 m leading distance and 30% speed reduction at
model/autonomous_drive.py:733-736 and relies on it for all NPC behavior).
Vectorized over all NPC vehicles: pure-pursuit steering along the lane graph,
car-following deceleration against the nearest leader in the forward corridor,
red/yellow light stops, plus pedestrian target-walking (controller.ai.walker
parity, :790-843).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cilrs_tpu.core.geometry import heading_vec, wrap_angle
from cilrs_tpu.core.state import WorldState
from cilrs_tpu.maps.network import LIGHT_RED, LIGHT_YELLOW, RoadNetwork

WP_REACH_DIST = 3.0
# Gaps are center-to-center; two 4.7 m cars touch at ~4.6 m, and stopping from
# the 21 km/h flow takes ~2.6 m — the stop gap must cover both.
LEAD_GAP_STOP = 9.0
LEAD_GAP_SLOW = 18.0
LIGHT_STOP_DIST = 12.0


def _advance_waypoints(net: RoadNetwork, pos: jnp.ndarray, wp: jnp.ndarray, salt: jnp.ndarray):
    """Advance each vehicle's waypoint when reached; random successor choice.

    The successor pick hashes (waypoint, per-vehicle salt) so it is deterministic
    for a given rollout but varied across vehicles — no host RNG in the loop.
    """
    target = net.wp_xy[wp]  # [V,2]
    d = jnp.linalg.norm(target - pos, axis=-1)
    reached = d < WP_REACH_DIST
    n = jnp.maximum(net.wp_num_next[wp], 1)
    h = (wp.astype(jnp.uint32) * jnp.uint32(2654435761) + salt) >> jnp.uint32(16)
    choice = (h % n.astype(jnp.uint32)).astype(jnp.int32)
    nxt = net.wp_next[wp, choice]
    return jnp.where(reached, nxt, wp)


def npc_controller(
    net: RoadNetwork,
    world: WorldState,
    light_state: jnp.ndarray,  # [L]
):
    """Controls [V,3] for every vehicle slot (ego slot 0 returns zeros; the
    driver overwrites it), plus advanced waypoint indices [V]."""
    V = world.num_vehicles
    pos = world.veh_pos
    yaw = world.veh_yaw
    speed = world.veh_speed

    salt = (jnp.arange(V, dtype=jnp.uint32) * jnp.uint32(40503)) ^ jnp.uint32(0x9E3779B9)
    wp = _advance_waypoints(net, pos, world.veh_wp, salt)

    # Pure pursuit toward the waypoint after next (smoother through curves).
    look = net.wp_next[wp, 0]
    target = 0.5 * (net.wp_xy[wp] + net.wp_xy[look])
    to_t = target - pos
    desired = jnp.arctan2(to_t[:, 1], to_t[:, 0])
    err = wrap_angle(desired - yaw)
    steer = jnp.clip(err * 1.8, -1.0, 1.0)

    # Leader gap: nearest alive actor in my forward corridor.
    fwd = heading_vec(yaw)  # [V,2]
    rel = pos[None, :, :] - pos[:, None, :]  # [me, other, 2]
    dist = jnp.linalg.norm(rel, axis=-1) + 1e-6
    lon = rel[..., 0] * fwd[:, None, 0] + rel[..., 1] * fwd[:, None, 1]
    lat = rel[..., 1] * fwd[:, None, 0] - rel[..., 0] * fwd[:, None, 1]
    same = jnp.eye(V, dtype=bool)
    blocking = (
        world.veh_alive[None, :]
        & ~same
        & (lon > 0.0)
        & (lon < 40.0)
        & (jnp.abs(lat) < 2.2)
    )
    lead_gap = jnp.min(jnp.where(blocking, lon, 1e6), axis=1)  # [V]

    # Pedestrians block too.
    relp = world.ped_pos[None, :, :] - pos[:, None, :]
    lonp = relp[..., 0] * fwd[:, None, 0] + relp[..., 1] * fwd[:, None, 1]
    latp = relp[..., 1] * fwd[:, None, 0] - relp[..., 0] * fwd[:, None, 1]
    blockp = world.ped_alive[None, :] & (lonp > 0.0) & (lonp < 25.0) & (jnp.abs(latp) < 2.2)
    lead_gap = jnp.minimum(lead_gap, jnp.min(jnp.where(blockp, lonp, 1e6), axis=1))

    # Traffic lights: stop if the light governing MY approach lane is red/yellow.
    # Lane-based gating (longitudinal window behind the stop line + lateral
    # on-lane check) — heading-only gating false-triggers on the far-side
    # approach of crossed junctions.
    if net.num_lights > 0:
        to_l = net.light_xy[None, :, :] - pos[:, None, :]  # [V,L,2]
        lfwd = heading_vec(net.light_yaw)  # [L,2]
        align = jnp.cos(yaw)[:, None] * jnp.cos(net.light_yaw)[None, :] + \
            jnp.sin(yaw)[:, None] * jnp.sin(net.light_yaw)[None, :]
        lon = -(to_l[..., 0] * lfwd[None, :, 0] + to_l[..., 1] * lfwd[None, :, 1])
        lat_l = jnp.abs(to_l[..., 0] * lfwd[None, :, 1] - to_l[..., 1] * lfwd[None, :, 0])
        stopgo = (light_state[None, :] == LIGHT_RED) | (light_state[None, :] == LIGHT_YELLOW)
        gate = (
            (lon >= -LIGHT_STOP_DIST) & (lon <= 1.0) & (lat_l <= 3.0)
            & (align >= 0.5) & stopgo
        )
        red_gate = jnp.any(gate, axis=1)
    else:
        red_gate = jnp.zeros((V,), bool)

    # Junction conflict handling (CARLA TM does this inside the server): slow
    # down inside junctions, and yield while turning left when any moving
    # vehicle is converging within the conflict horizon. Predicted-position
    # check at +0.6 s and +1.2 s resolves crossing paths that the instantaneous
    # corridor misses.
    in_junction = net.wp_is_junction[wp]
    turning_left = net.wp_turn[wp] == 1
    vel = heading_vec(yaw) * speed[:, None]  # [V,2]
    conflict = jnp.zeros((V,), bool)
    for horizon in (0.6, 1.2):
        pi = pos + vel * horizon  # [V,2]
        dd = jnp.linalg.norm(pi[None, :, :] - pi[:, None, :], axis=-1)
        close = (dd < 3.5) & world.veh_alive[None, :] & ~same
        # Only conflicts with actors that are actually moving (else deadlock).
        moving = jnp.abs(world.veh_speed)[None, :] > 0.8
        conflict = conflict | jnp.any(close & moving, axis=1)
    yield_now = turning_left & in_junction & conflict

    # Longitudinal control: P-control to target speed with gap/light overrides.
    v_err = world.veh_target_speed - speed
    junction_cap = jnp.where(in_junction, 15.0 / 3.6, 1e9)
    v_err = jnp.minimum(v_err, junction_cap - speed)
    throttle = jnp.clip(v_err * 0.5, 0.0, 0.75)
    brake = jnp.clip(-v_err * 0.4, 0.0, 0.5)
    slow = lead_gap < LEAD_GAP_SLOW
    throttle = jnp.where(slow, jnp.minimum(throttle, 0.2), throttle)
    stop = (lead_gap < LEAD_GAP_STOP) | red_gate | yield_now
    throttle = jnp.where(stop, 0.0, throttle)
    brake = jnp.where(stop, 0.8, brake)

    controls = jnp.stack([steer, throttle, brake], axis=-1)
    controls = controls.at[0].set(jnp.zeros(3))  # ego slot handled by the driver
    return controls, wp


def pedestrian_step_targets(world: WorldState, key: jnp.ndarray):
    """Re-aim pedestrians periodically: small random heading drift (walker AI)."""
    turn = jax.random.uniform(key, (world.num_pedestrians,), minval=-0.3, maxval=0.3)
    do_turn = jax.random.uniform(key, (world.num_pedestrians,)) < 0.02
    new_yaw = jnp.where(do_turn, world.ped_yaw + turn, world.ped_yaw)
    return new_yaw
