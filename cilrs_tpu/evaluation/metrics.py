"""DrivingMetrics as a pytree accumulated inside the jitted rollout.

Counterpart of the reference's DrivingMetrics (model/autonomous_drive.py:50-172):
distance/time/speed accumulation, steering jerk, off-road frames, collisions by
actor type with the 3 s per-type cooldown the reference applies in its collision
callback (:875-892), red-light stops, route counters. Scoring formulas live in
`evaluation.scoring` (host side, identical math).

One deliberate upgrade: the reference declares `red_light_violations` in its
scoring formula but no code path ever increments it (grep: only init/score/print).
Here a violation is actually detected — passing a governing red light's stop line
— so the Safety term means what the docs say it means.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

COOLDOWN_S = 3.0
COL_VEHICLE, COL_WALKER, COL_OTHER = 0, 1, 2


@struct.dataclass
class Metrics:
    total_distance: jnp.ndarray  # m
    total_time: jnp.ndarray  # s
    total_frames: jnp.ndarray
    speed_sum: jnp.ndarray  # km/h accumulated
    speed_max: jnp.ndarray  # km/h
    jerk_sum: jnp.ndarray  # sum |d steer|
    last_steer: jnp.ndarray
    off_road_frames: jnp.ndarray
    collisions: jnp.ndarray  # [3] per-type counts (vehicle, walker, other)
    collision_cooldown_until: jnp.ndarray  # [3] sim time
    red_light_stops: jnp.ndarray
    red_light_violations: jnp.ndarray
    routes_completed: jnp.ndarray
    routes_attempted: jnp.ndarray
    obstacle_brakes: jnp.ndarray
    teleports: jnp.ndarray
    recoveries: jnp.ndarray


def init_metrics() -> Metrics:
    z = jnp.asarray(0.0, jnp.float32)
    return Metrics(
        total_distance=z, total_time=z, total_frames=z,
        speed_sum=z, speed_max=z, jerk_sum=z, last_steer=z,
        off_road_frames=z,
        collisions=jnp.zeros(3, jnp.float32),
        collision_cooldown_until=jnp.full((3,), -1.0, jnp.float32),
        red_light_stops=z, red_light_violations=z,
        routes_completed=z, routes_attempted=jnp.asarray(1.0, jnp.float32),
        obstacle_brakes=z, teleports=z, recoveries=z,
    )


def update_metrics(
    m: Metrics,
    speed_kmh: jnp.ndarray,
    steer: jnp.ndarray,
    on_road: jnp.ndarray,
    dt: float,
    now: jnp.ndarray,
    hit_vehicle: jnp.ndarray,
    hit_walker: jnp.ndarray,
    red_light_stop: jnp.ndarray,
    red_light_violation: jnp.ndarray,
    obstacle_brake: jnp.ndarray,
    route_completed: jnp.ndarray,
    route_attempted: jnp.ndarray,
    teleported: jnp.ndarray,
    recovered: jnp.ndarray,
) -> Metrics:
    """Per-tick accumulation (reference update(), :76-91, + event counters)."""
    jerk = jnp.abs(steer - m.last_steer)

    hits = jnp.stack([hit_vehicle, hit_walker, jnp.asarray(False)])
    off_cd = now > m.collision_cooldown_until
    counted = hits & off_cd
    collisions = m.collisions + counted.astype(jnp.float32)
    cooldown = jnp.where(counted, now + COOLDOWN_S, m.collision_cooldown_until)

    f = lambda b: b.astype(jnp.float32)
    return Metrics(
        total_distance=m.total_distance + speed_kmh * dt / 3.6,
        total_time=m.total_time + dt,
        total_frames=m.total_frames + 1.0,
        speed_sum=m.speed_sum + speed_kmh,
        speed_max=jnp.maximum(m.speed_max, speed_kmh),
        jerk_sum=m.jerk_sum + jerk,
        last_steer=steer,
        off_road_frames=m.off_road_frames + f(~on_road),
        collisions=collisions,
        collision_cooldown_until=cooldown,
        red_light_stops=m.red_light_stops + f(red_light_stop),
        red_light_violations=m.red_light_violations + f(red_light_violation),
        routes_completed=m.routes_completed + f(route_completed),
        routes_attempted=m.routes_attempted + f(route_attempted),
        obstacle_brakes=m.obstacle_brakes + f(obstacle_brake),
        teleports=m.teleports + f(teleported),
        recoveries=m.recoveries + f(recovered),
    )
