"""Vehicle dynamics: vectorized kinematic bicycle model + pedestrian kinematics.

Replaces the CARLA server's PhysX vehicle simulation (the reference never owns
physics — it sends ``vehicle.apply_control`` RPCs and waits on ``world.tick()``,
reference model/autonomous_drive.py:1131,1654). Here physics is a pure, static-shape
function over all V vehicles at once, trivially `vmap`-able over an env batch and
fused by XLA with rendering and the policy into one device program.

Weather couples in through a friction scalar (grip): reduced friction lengthens
braking and caps lateral acceleration, which is what the per-weather
``brake_factor``/``traction_control`` profile in the reference's (dead) weather
config models from the controller side.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.core.geometry import heading_vec
from cilrs_tpu.core.state import VehicleParams, WorldState


def bicycle_step(
    pos: jnp.ndarray,  # [..., 2]
    yaw: jnp.ndarray,  # [...]
    speed: jnp.ndarray,  # [...] signed m/s
    steer: jnp.ndarray,  # [...] in [-1, 1]
    throttle: jnp.ndarray,  # [...] in [0, 1]
    brake: jnp.ndarray,  # [...] in [0, 1]
    reverse: jnp.ndarray,  # [...] bool
    params: VehicleParams,
    friction: jnp.ndarray,  # scalar or [...] grip multiplier in (0, 1]
    dt: float,
):
    """One integration step. Returns (pos', yaw', speed')."""
    drive_sign = jnp.where(reverse, -1.0, 1.0)
    accel = drive_sign * throttle * params.max_accel * friction
    # Brake and drag oppose current motion; never flip the sign of speed.
    speed_sign = jnp.sign(speed)
    decel = brake * params.max_brake_decel * friction + params.drag_c0 + params.drag_c1 * jnp.abs(speed)
    new_speed = speed + dt * accel
    braked = jnp.abs(new_speed) - dt * decel
    new_speed = speed_sign_safe(new_speed) * jnp.maximum(braked, 0.0)
    # While stationary with no throttle, stay stationary (brake holds).
    new_speed = jnp.where(
        (jnp.abs(speed) < 1e-3) & (throttle < 1e-3), 0.0, new_speed
    )
    max_fwd = 60.0 / 3.6  # absolute powertrain cap, above the 45 km/h rule cap
    new_speed = jnp.clip(new_speed, -params.max_reverse_speed, max_fwd)

    # Lateral grip limit: cap yaw rate so that v * yaw_rate <= friction * a_lat_max.
    delta = steer * params.max_steer_rad
    yaw_rate = new_speed / params.wheelbase * jnp.tan(delta)
    a_lat_max = 9.81 * friction * 0.9
    max_yaw_rate = a_lat_max / jnp.maximum(jnp.abs(new_speed), 1.0)
    yaw_rate = jnp.clip(yaw_rate, -max_yaw_rate, max_yaw_rate)

    new_yaw = yaw + yaw_rate * dt
    new_pos = pos + heading_vec(new_yaw) * new_speed[..., None] * dt
    return new_pos, new_yaw, new_speed


def speed_sign_safe(v: jnp.ndarray) -> jnp.ndarray:
    """sign(v) but +1 at exactly 0 so brake math cannot create NaNs/stalls."""
    return jnp.where(v < 0.0, -1.0, 1.0)


def world_physics_step(
    world: WorldState,
    controls: jnp.ndarray,  # [V, 3] (steer, throttle, brake) for ALL vehicles
    reverse: jnp.ndarray,  # [V] bool
    params: VehicleParams,
    friction: jnp.ndarray,  # scalar grip for this env's weather
    dt: float,
) -> WorldState:
    """Integrate every vehicle and pedestrian one tick. Dead actors stay frozen."""
    steer = jnp.clip(controls[:, 0], -1.0, 1.0)
    throttle = jnp.clip(controls[:, 1], 0.0, 1.0)
    brake = jnp.clip(controls[:, 2], 0.0, 1.0)

    pos, yaw, speed = bicycle_step(
        world.veh_pos, world.veh_yaw, world.veh_speed,
        steer, throttle, brake, reverse, params, friction, dt,
    )
    alive = world.veh_alive
    pos = jnp.where(alive[:, None], pos, world.veh_pos)
    yaw = jnp.where(alive, yaw, world.veh_yaw)
    speed = jnp.where(alive, speed, 0.0)

    # Pedestrians: constant-speed walk along their heading.
    ped_pos = jnp.where(
        world.ped_alive[:, None],
        world.ped_pos + heading_vec(world.ped_yaw) * world.ped_speed[:, None] * dt,
        world.ped_pos,
    )

    return world.replace(
        veh_pos=pos,
        veh_yaw=yaw,
        veh_speed=speed,
        veh_control=jnp.stack([steer, throttle, brake], axis=-1),
        veh_reverse=reverse,
        ped_pos=ped_pos,
        time_s=world.time_s + dt,
        step=world.step + 1,
    )


def vehicle_circles(pos: jnp.ndarray, yaw: jnp.ndarray, params: VehicleParams):
    """Two-circle collision proxy per vehicle: centers [..., 2, 2] and radius.

    Circle radius = width/2 + margin; centers at +/- length/4 along heading.
    """
    h = heading_vec(yaw)
    offset = (params.length / 4.0)
    centers = jnp.stack([pos + h * offset, pos - h * offset], axis=-2)
    radius = params.width / 2.0 + 0.1
    return centers, radius


def detect_ego_collisions(world: WorldState, params: VehicleParams):
    """Ego-vs-actor overlap test. Returns (hit_vehicle, hit_walker) bools.

    Mirrors the CARLA collision sensor events the reference listens for
    (model/autonomous_drive.py:875-892); the per-type 3 s cooldown is applied by
    the metrics accumulator, not here.
    """
    ego_c, r = vehicle_circles(world.veh_pos[0], world.veh_yaw[0], params)  # [2,2]

    npc_c, _ = vehicle_circles(world.veh_pos[1:], world.veh_yaw[1:], params)  # [V-1,2,2]
    d = jnp.linalg.norm(ego_c[None, :, None, :] - npc_c[:, None, :, :], axis=-1)  # [V-1,2,2]
    veh_hit = jnp.any((d < 2.0 * r) & world.veh_alive[1:, None, None], axis=(1, 2))
    hit_vehicle = jnp.any(veh_hit)

    ped_r = 0.4
    dp = jnp.linalg.norm(ego_c[:, None, :] - world.ped_pos[None, :, :], axis=-1)  # [2,P]
    hit_walker = jnp.any((dp < (r + ped_r)) & world.ped_alive[None, :])
    return hit_vehicle, hit_walker
