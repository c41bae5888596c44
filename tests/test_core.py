import jax
import jax.numpy as jnp
import numpy as np

from cilrs_tpu.core.dynamics import bicycle_step, detect_ego_collisions, world_physics_step
from cilrs_tpu.core.geometry import heading_vec, wrap_angle, world_to_body
from cilrs_tpu.core.state import default_vehicle_params, make_world


def test_wrap_angle():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi])
    w = wrap_angle(a)
    assert np.all(np.abs(np.asarray(w)) <= np.pi + 1e-6)
    np.testing.assert_allclose(np.asarray(w[0]), 0.0, atol=1e-7)


def test_world_to_body():
    p = jnp.array([1.0, 1.0])
    out = world_to_body(p, jnp.array([0.0, 0.0]), jnp.asarray(np.pi / 2))
    np.testing.assert_allclose(np.asarray(out), [1.0, -1.0], atol=1e-6)


def test_bicycle_straight_accel():
    params = default_vehicle_params()
    pos = jnp.zeros(2)
    yaw = jnp.asarray(0.0)
    speed = jnp.asarray(0.0)
    for _ in range(100):  # 5 s full throttle
        pos, yaw, speed = bicycle_step(
            pos, yaw, speed, jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0),
            jnp.asarray(False), params, jnp.asarray(1.0), 0.05,
        )
    v = float(speed)
    assert 8.0 < v < 17.0  # reaches ~30-60 km/h region
    assert float(pos[0]) > 20.0
    assert abs(float(pos[1])) < 1e-3
    assert abs(float(yaw)) < 1e-6


def test_bicycle_brake_stops():
    params = default_vehicle_params()
    pos, yaw, speed = jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(10.0)
    for _ in range(60):
        pos, yaw, speed = bicycle_step(
            pos, yaw, speed, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
            jnp.asarray(False), params, jnp.asarray(1.0), 0.05,
        )
    assert float(speed) == 0.0  # never goes negative under braking


def test_bicycle_turns_left():
    params = default_vehicle_params()
    pos, yaw, speed = jnp.zeros(2), jnp.asarray(0.0), jnp.asarray(8.0)
    for _ in range(40):
        pos, yaw, speed = bicycle_step(
            pos, yaw, speed, jnp.asarray(0.5), jnp.asarray(0.3), jnp.asarray(0.0),
            jnp.asarray(False), params, jnp.asarray(1.0), 0.05,
        )
    assert float(yaw) > 0.3  # CCW
    assert float(pos[1]) > 1.0


def test_world_physics_step_shapes():
    params = default_vehicle_params()
    world = make_world(num_vehicles=4, num_pedestrians=3)
    world = world.replace(veh_alive=jnp.ones(4, bool))
    controls = jnp.tile(jnp.array([0.0, 0.5, 0.0]), (4, 1))
    reverse = jnp.zeros(4, bool)
    w2 = jax.jit(lambda w: world_physics_step(w, controls, reverse, params, jnp.asarray(1.0), 0.05))(world)
    assert w2.veh_pos.shape == (4, 2)
    assert abs(float(w2.time_s) - 0.05) < 1e-6
    assert int(w2.step) == 1
    assert float(w2.veh_speed[0]) > 0.0


def test_collision_detection():
    params = default_vehicle_params()
    world = make_world(num_vehicles=2, num_pedestrians=1)
    world = world.replace(
        veh_alive=jnp.ones(2, bool),
        veh_pos=jnp.array([[0.0, 0.0], [1.0, 0.0]]),
    )
    hv, hw = detect_ego_collisions(world, params)
    assert bool(hv)
    world_far = world.replace(veh_pos=jnp.array([[0.0, 0.0], [50.0, 0.0]]))
    hv2, _ = detect_ego_collisions(world_far, params)
    assert not bool(hv2)
    # Pedestrian on top of ego
    world_ped = world_far.replace(
        ped_pos=jnp.array([[1.0, 0.0]]), ped_alive=jnp.ones(1, bool)
    )
    _, hw3 = detect_ego_collisions(world_ped, params)
    assert bool(hw3)


def test_heading_vec():
    h = heading_vec(jnp.asarray(np.pi / 2))
    np.testing.assert_allclose(np.asarray(h), [0.0, 1.0], atol=1e-7)
