"""Closed-loop integration tests: the fused env step + scan rollout.

Deterministic replacements for the reference's wall-clock benchmark runs
(SURVEY.md §4): fixed PRNG, fixed routes, small map, assertions on behavior.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilrs_tpu.agent.driver import DT, env_step, make_driver_state, rollout
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.config import load_weather_table
from cilrs_tpu.core.state import default_vehicle_params
from cilrs_tpu.evaluation import compute_scores
from cilrs_tpu.maps.routing import chained_route_pool
from cilrs_tpu.render.camera import CameraSpec

TINY_CAM = CameraSpec(width=64, height=32)


@pytest.fixture(scope="module")
def setup(mini_town):
    rng = np.random.RandomState(3)
    pool = chained_route_pool(mini_town, rng, num_routes=3, min_dist=40.0, max_dist=250.0)
    start_wp = int(np.asarray(pool.wp_index)[0, 0])
    spawns = np.asarray(mini_town.spawn_wp)
    ego_spawn = int(np.where(spawns == start_wp)[0][0]) if (spawns == start_wp).any() else 0
    world = spawn_world(mini_town, num_vehicles=4, num_pedestrians=2,
                        rng=rng, ego_spawn=ego_spawn)
    # Place ego exactly at the route start.
    wp_xy = np.asarray(mini_town.wp_xy)
    wp_yaw = np.asarray(mini_town.wp_yaw)
    world = world.replace(
        veh_pos=world.veh_pos.at[0].set(jnp.asarray(wp_xy[start_wp])),
        veh_yaw=world.veh_yaw.at[0].set(float(wp_yaw[start_wp])),
    )
    return {
        "net": mini_town,
        "pool": pool,
        "world": world,
        "wt": load_weather_table(),
        "params": default_vehicle_params(),
    }


def test_autopilot_rollout_makes_progress(setup):
    state = make_driver_state(setup["world"])
    roll = jax.jit(functools.partial(
        rollout, steps=300, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], policy_fn=None,
        mode="collect", cam=TINY_CAM, want_frames=False,
    ))
    final, outs = roll(state)
    dist = float(final.metrics.total_distance)
    assert dist > 30.0, f"autopilot only moved {dist:.1f} m in 15 s"
    # Speed stays in a sane urban band.
    speeds = np.asarray(outs["speed_kmh"])
    assert speeds.max() < 50.0
    assert speeds.max() > 15.0
    # Route index advances.
    assert int(final.route_idx) > 5 or int(final.route_id) > 0
    # Time advanced correctly.
    np.testing.assert_allclose(float(final.world.time_s), 300 * DT, atol=1e-3)


def test_autopilot_stays_on_road(setup):
    state = make_driver_state(setup["world"])
    roll = jax.jit(functools.partial(
        rollout, steps=400, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], policy_fn=None,
        mode="collect", cam=TINY_CAM, want_frames=False,
    ))
    final, _ = roll(state)
    s = compute_scores(final.metrics)
    assert s["off_road_pct"] < 15.0, f"off-road {s['off_road_pct']:.1f}%"


def test_drive_mode_cascade_with_stub_policy(setup):
    """Drive mode with a constant-output policy: the cascade must keep the car
    moving and the status codes sane."""

    def stub_policy(img, speed_norm, cmd):
        return jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (img.shape[0], 1))

    state = make_driver_state(setup["world"])
    roll = jax.jit(functools.partial(
        rollout, steps=200, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], policy_fn=stub_policy,
        mode="drive", cam=TINY_CAM, want_frames=False,
    ))
    final, outs = roll(state)
    # The governor accelerates from standstill: distance covered.
    assert float(final.metrics.total_distance) > 10.0
    st = np.asarray(outs["status"])
    assert (st >= 0).all() and (st <= 9).all()
    assert np.isfinite(np.asarray(outs["control"])).all()


def test_collision_recovery_fires(setup):
    """Park an NPC right on the ego: collision -> recovery machine engages."""
    world = setup["world"]
    ego = np.asarray(world.veh_pos[0])
    yaw = float(world.veh_yaw[0])
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world2 = world.replace(
        veh_pos=world.veh_pos.at[1].set(jnp.asarray((ego + fwd * 3.0).astype(np.float32))),
        veh_yaw=world.veh_yaw.at[1].set(yaw),
    )
    state = make_driver_state(world2)
    roll = jax.jit(functools.partial(
        rollout, steps=100, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], policy_fn=None,
        mode="collect", cam=TINY_CAM, want_frames=False,
    ))
    final, outs = roll(state)
    assert float(np.asarray(final.metrics.collisions).sum()) >= 1.0
    assert float(final.metrics.recoveries) >= 1.0


def test_env_step_single_tick_shapes(setup):
    state = make_driver_state(setup["world"])
    step = jax.jit(functools.partial(
        env_step, net=setup["net"], pool=setup["pool"], wt=setup["wt"],
        params=setup["params"], policy_fn=None, mode="collect",
        cam=TINY_CAM, want_frame=True,
    ))
    s2, out = step(state)
    assert out["frame"].shape == (TINY_CAM.height, TINY_CAM.width, 3)
    assert int(s2.world.step) == 1
    assert np.isfinite(np.asarray(out["control"])).all()


def test_vmapped_fleet_rollout(setup):
    """vmap the whole rollout over a small fleet with different weathers."""
    B = 3
    base = make_driver_state(setup["world"])
    fleet = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), base)
    fleet = fleet.replace(world=fleet.world.replace(
        weather_idx=jnp.arange(B, dtype=jnp.int32),
        rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32)),
    ))

    def one(st):
        return rollout(st, steps=100, net=setup["net"], pool=setup["pool"],
                       wt=setup["wt"], params=setup["params"], policy_fn=None,
                       mode="collect", cam=TINY_CAM, want_frames=False)

    finals, outs = jax.jit(jax.vmap(one))(fleet)
    d = np.asarray(finals.metrics.total_distance)
    assert d.shape == (B,)
    assert (d > 5.0).all(), f"some envs stalled: {d}"


def test_fleet_rollout_batched_policy(setup):
    """fleet_rollout (batched policy) matches env behavior and makes progress."""
    import jax.numpy as jnp
    from cilrs_tpu.agent.driver import fleet_rollout

    def stub_apply(variables, x, speed, cmd, train=False):
        B = x.shape[0]
        return jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (B, 1)), jnp.zeros(B)

    B = 2
    base = make_driver_state(setup["world"])
    fleet = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), base)
    fleet = fleet.replace(world=fleet.world.replace(
        rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))))

    roll = jax.jit(functools.partial(
        fleet_rollout, steps=150, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], apply_fn=stub_apply,
        variables={}, mode="drive", cam=TINY_CAM, want_frames=False,
    ))
    final, outs = roll(fleet)
    d = np.asarray(final.metrics.total_distance)
    assert d.shape == (B,)
    assert (d > 8.0).all(), f"fleet stalled: {d}"
    assert "frame" not in outs
    assert np.isfinite(np.asarray(outs["control"])).all()


def test_depart_delay_holds_then_departs(setup):
    """hold_until_s parks the ego (departure-phase sweep), then normal driving
    resumes; the rescue machinery never fires during a sub-15 s hold."""

    def stub_policy(img, speed_norm, cmd):
        return jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (img.shape[0], 1))

    state = make_driver_state(setup["world"])
    roll = jax.jit(functools.partial(
        rollout, steps=200, net=setup["net"], pool=setup["pool"],
        wt=setup["wt"], params=setup["params"], policy_fn=stub_policy,
        mode="drive", cam=TINY_CAM, want_frames=False, hold_until_s=5.0,
    ))
    final, outs = roll(state)
    speeds = np.asarray(outs["speed_kmh"])
    hold_ticks = int(5.0 / DT)
    assert speeds[:hold_ticks].max() < 1.0, "ego moved during the hold"
    assert speeds[hold_ticks:].max() > 5.0, "ego never departed after the hold"
    assert float(final.metrics.teleports) == 0.0
