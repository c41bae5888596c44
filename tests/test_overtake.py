"""Overtake/reverse state machine on a 2-lanes-per-direction map.

The reference's overtake only ever escalates to REVERSE in Town01 (single lane
per direction: can_overtake's same-direction adjacent-lane check fails,
model/autonomous_drive.py:1159). Our generator supports multi-lane roads, so
the lane-change path is actually exercisable.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilrs_tpu.agent.controller import (
    OV_LEFT, OV_NONE, OV_RIGHT, ST_OVERTAKE_L, ST_OVERTAKE_R, ST_REVERSE,
    can_overtake, init_ctrl_state, safety_controller,
)
from cilrs_tpu.agent.driver import make_driver_state, rollout
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.config import load_weather_table
from cilrs_tpu.core.state import default_vehicle_params, make_world
from cilrs_tpu.maps.network import host_arrays
from cilrs_tpu.maps.routing import chained_route_pool
from cilrs_tpu.maps.town import make_town01
from cilrs_tpu.render.camera import CameraSpec


@pytest.fixture(scope="module")
def twolane():
    return make_town01(blocks_x=2, blocks_y=2, block_m=80.0, lanes_per_dir=2,
                       tex_scale=1.0)


def test_two_lane_adjacency(twolane):
    h = host_arrays(twolane)
    # Some waypoints have a same-direction neighbor.
    assert (h.wp_left >= 0).sum() > 50
    assert (h.wp_right >= 0).sum() > 50


def test_can_overtake_clear_lane(twolane):
    h = host_arrays(twolane)
    # Pick a waypoint whose left neighbor exists.
    cand = np.nonzero(h.wp_left >= 0)[0]
    wp = int(cand[len(cand) // 2])
    world = make_world(2, 0)
    world = world.replace(
        veh_pos=world.veh_pos.at[0].set(jnp.asarray(h.wp_xy[wp])),
        veh_yaw=world.veh_yaw.at[0].set(float(h.wp_yaw[wp])),
    )
    left_ok, right_ok = can_overtake(twolane, world)
    assert bool(left_ok) or bool(right_ok)

    # Park a vehicle in the adjacent lane: that side must become blocked.
    adj = int(h.wp_left[wp]) if h.wp_left[wp] >= 0 else int(h.wp_right[wp])
    world_blocked = world.replace(
        veh_pos=world.veh_pos.at[1].set(jnp.asarray(h.wp_xy[adj])),
        veh_yaw=world.veh_yaw.at[1].set(float(h.wp_yaw[adj])),
        veh_alive=world.veh_alive.at[1].set(True),
    )
    l2, r2 = can_overtake(twolane, world_blocked)
    if h.wp_left[wp] >= 0:
        assert not bool(l2)
    else:
        assert not bool(r2)


def test_overtake_machine_engages(twolane):
    """Blocked lane + long wait -> the machine enters a lane-change phase."""
    h = host_arrays(twolane)
    cand = np.nonzero((h.wp_left >= 0) & ~h.wp_is_junction)[0]
    wp = int(cand[len(cand) // 2])
    world = make_world(3, 0)
    yaw = float(h.wp_yaw[wp])
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world = world.replace(
        veh_pos=jnp.asarray(np.stack([
            h.wp_xy[wp], h.wp_xy[wp] + fwd * 7.0, h.wp_xy[wp] - fwd * 500.0,
        ]).astype(np.float32)),
        veh_yaw=jnp.full((3,), yaw),
        veh_alive=jnp.array([True, True, False]),
        time_s=jnp.asarray(100.0),
    )
    ctrl = init_ctrl_state()
    # Simulate having waited 5 s behind the obstacle, red cleared long ago.
    ctrl = ctrl.replace(
        obstacle_wait_start=jnp.asarray(95.0),
        red_clear_time=jnp.asarray(50.0),
    )
    wt = load_weather_table()
    control, reverse, status, ctrl2, events = safety_controller(
        twolane, world, ctrl, wt,
        jnp.asarray(0.0), jnp.asarray(0.3), jnp.asarray(0.0),
        jnp.asarray(1.0),  # crawling
        jnp.asarray(0, jnp.int32), jnp.asarray(0.0),
        jnp.asarray(7.0),  # obstacle at 7 m
        jnp.asarray(3, jnp.int32),  # no light
    )
    assert int(ctrl2.ov_state) in (OV_LEFT, OV_RIGHT)
    assert int(status) in (ST_OVERTAKE_L, ST_OVERTAKE_R)
    # Lane-change phase steers toward the free lane.
    assert abs(float(control[0])) > 0.01
    assert float(control[1]) > 0.3  # committed throttle


def test_reverse_escalation_single_lane(mini_town):
    """On a single-lane map with no adjacent lane, a long wait escalates to
    REVERSE (the only option in Town01, reference :1237-1242)."""
    h = host_arrays(mini_town)
    cand = np.nonzero((h.wp_left < 0) & (h.wp_right < 0) & ~h.wp_is_junction)[0]
    wp = int(cand[len(cand) // 2])
    world = make_world(2, 0)
    yaw = float(h.wp_yaw[wp])
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world = world.replace(
        veh_pos=jnp.asarray(np.stack([h.wp_xy[wp], h.wp_xy[wp] + fwd * 7.0]).astype(np.float32)),
        veh_yaw=jnp.full((2,), yaw),
        veh_alive=jnp.ones(2, bool),
        time_s=jnp.asarray(100.0),
    )
    ctrl = init_ctrl_state().replace(
        obstacle_wait_start=jnp.asarray(91.0),  # waited 9 s > 8 s escalation
        red_clear_time=jnp.asarray(50.0),
    )
    wt = load_weather_table()
    control, reverse, status, ctrl2, events = safety_controller(
        mini_town, world, ctrl, wt,
        jnp.asarray(0.0), jnp.asarray(0.3), jnp.asarray(0.0),
        jnp.asarray(1.0), jnp.asarray(0, jnp.int32), jnp.asarray(0.1),
        jnp.asarray(7.0), jnp.asarray(3, jnp.int32),
    )
    from cilrs_tpu.agent.controller import OV_REVERSE
    assert int(ctrl2.ov_state) == OV_REVERSE
    assert int(status) == ST_REVERSE
    assert bool(reverse)
