"""World state pytrees.

Replaces CARLA's server-side world (reference model/autonomous_drive.py:551-577
``carla.Client``/``world.tick`` and every actor handle) with a single immutable
pytree of statically-shaped arrays. Vehicle 0 is the ego; indices 1..V-1 are NPC
traffic. Everything is designed to be `vmap`ed over an environment batch and
sharded over a device mesh — there is no actor object, no RPC, no callback thread
(the reference needed a lock for its camera callback,
model/autonomous_drive.py:869-873; pure state makes that class of race impossible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VehicleParams:
    """Kinematic-bicycle + longitudinal parameters (scalar pytree leaves).

    Tuned so cruise behavior matches the reference protocol: ~35 km/h cruise,
    45 km/h hard cap (reference model/autonomous_drive.py:945-948), 20 Hz tick.
    """

    wheelbase: jnp.ndarray  # m
    max_steer_rad: jnp.ndarray  # front-wheel angle at |steer|=1
    max_accel: jnp.ndarray  # m/s^2 at throttle=1
    max_brake_decel: jnp.ndarray  # m/s^2 at brake=1
    max_reverse_speed: jnp.ndarray  # m/s
    drag_c0: jnp.ndarray  # constant rolling resistance, m/s^2
    drag_c1: jnp.ndarray  # linear drag coefficient, 1/s
    length: jnp.ndarray  # bounding-box length, m
    width: jnp.ndarray  # bounding-box width, m


def default_vehicle_params() -> VehicleParams:
    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return VehicleParams(
        wheelbase=f32(2.9),
        max_steer_rad=f32(0.6109),  # 35 degrees
        max_accel=f32(4.0),
        max_brake_decel=f32(8.0),
        max_reverse_speed=f32(5.0),
        drag_c0=f32(0.15),
        drag_c1=f32(0.08),
        length=f32(4.7),
        width=f32(2.0),
    )


@struct.dataclass
class WorldState:
    """One environment's full dynamic state (un-batched; vmap for fleets).

    Shapes: V = num vehicles (ego at index 0), P = num pedestrians.
    """

    veh_pos: jnp.ndarray  # [V, 2] world xy, m
    veh_yaw: jnp.ndarray  # [V] rad
    veh_speed: jnp.ndarray  # [V] m/s, signed (negative while reversing)
    veh_alive: jnp.ndarray  # [V] bool
    veh_control: jnp.ndarray  # [V, 3] last applied (steer, throttle, brake)
    veh_reverse: jnp.ndarray  # [V] bool — gear selection
    veh_wp: jnp.ndarray  # [V] int32 — current lane-graph waypoint (NPC AI; ego unused)
    veh_target_speed: jnp.ndarray  # [V] m/s — NPC cruise targets

    ped_pos: jnp.ndarray  # [P, 2]
    ped_yaw: jnp.ndarray  # [P]
    ped_speed: jnp.ndarray  # [P] m/s
    ped_alive: jnp.ndarray  # [P] bool

    time_s: jnp.ndarray  # scalar f32 — sim time
    step: jnp.ndarray  # scalar i32
    weather_idx: jnp.ndarray  # scalar i32 into WeatherTable
    rng: jnp.ndarray  # PRNG key

    @property
    def num_vehicles(self) -> int:
        return self.veh_pos.shape[0]

    @property
    def num_pedestrians(self) -> int:
        return self.ped_pos.shape[0]

    @property
    def ego_pos(self) -> jnp.ndarray:
        return self.veh_pos[0]

    @property
    def ego_yaw(self) -> jnp.ndarray:
        return self.veh_yaw[0]

    @property
    def ego_speed(self) -> jnp.ndarray:
        return self.veh_speed[0]


def make_world(
    num_vehicles: int,
    num_pedestrians: int,
    rng: jnp.ndarray | None = None,
    weather_idx: int = 0,
) -> WorldState:
    """Blank world with all actors at the origin and not alive (except ego).

    Scenario setup (spawning on the map, NPC placement) is done by
    ``cilrs_tpu.agent.scenario.spawn_world`` — this is just the container.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    V, P = num_vehicles, num_pedestrians
    return WorldState(
        veh_pos=jnp.zeros((V, 2), jnp.float32),
        veh_yaw=jnp.zeros((V,), jnp.float32),
        veh_speed=jnp.zeros((V,), jnp.float32),
        veh_alive=jnp.zeros((V,), bool).at[0].set(True),
        veh_control=jnp.zeros((V, 3), jnp.float32),
        veh_reverse=jnp.zeros((V,), bool),
        veh_wp=jnp.zeros((V,), jnp.int32),
        veh_target_speed=jnp.full((V,), 30.0 / 3.6, jnp.float32),
        ped_pos=jnp.zeros((P, 2), jnp.float32),
        ped_yaw=jnp.zeros((P,), jnp.float32),
        ped_speed=jnp.zeros((P,), jnp.float32),
        ped_alive=jnp.zeros((P,), bool),
        time_s=jnp.asarray(0.0, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
        weather_idx=jnp.asarray(weather_idx, jnp.int32),
        rng=rng,
    )
