import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilrs_tpu.agent.controller import (
    ST_BRAKE, ST_OK, ST_RED, ST_UNSTICK, ST_YELLOW,
    init_ctrl_state, safety_controller,
)
from cilrs_tpu.config import load_weather_table
from cilrs_tpu.core.state import make_world
from cilrs_tpu.maps.network import LIGHT_GREEN, LIGHT_NONE, LIGHT_RED, LIGHT_YELLOW
from cilrs_tpu.ops.filters import init_smoothing, smooth_controls


@pytest.fixture(scope="module")
def wt():
    return load_weather_table()


def _run(mini_town, wt, *, nn=(0.0, 0.5, 0.0), speed=20.0, cmd=0, hint=0.0,
         obs=999.0, tl=LIGHT_NONE, ctrl=None, world=None, time_s=50.0,
         red_ahead=False):
    if world is None:
        world = make_world(2, 1)
        wp = np.asarray(mini_town.wp_xy)[0]
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(wp)),
            time_s=jnp.asarray(time_s, jnp.float32),
        )
    if ctrl is None:
        ctrl = init_ctrl_state()
    return safety_controller(
        mini_town, world, ctrl, wt,
        jnp.asarray(nn[0]), jnp.asarray(nn[1]), jnp.asarray(nn[2]),
        jnp.asarray(speed), jnp.asarray(cmd, jnp.int32), jnp.asarray(hint),
        jnp.asarray(obs), jnp.asarray(tl, jnp.int32),
        red_ahead=jnp.asarray(red_ahead),
    )


def test_red_light_full_stop(mini_town, wt):
    control, reverse, status, ctrl2, events = _run(mini_town, wt, tl=LIGHT_RED, speed=25.0)
    assert int(status) == ST_RED
    assert float(control[1]) == 0.0
    np.testing.assert_allclose(float(control[2]), 0.8, atol=1e-6)
    assert bool(events["red_light_stop"])
    assert bool(ctrl2.waiting_for_red)
    # Second tick: no double-count of the stop event.
    _, _, _, _, ev2 = _run(mini_town, wt, tl=LIGHT_RED, ctrl=ctrl2)
    assert not bool(ev2["red_light_stop"])


def test_yellow_slow_stop_fast_proceed(mini_town, wt):
    _, _, st_slow, _, _ = _run(mini_town, wt, tl=LIGHT_YELLOW, speed=20.0)
    assert int(st_slow) == ST_YELLOW
    _, _, st_fast, _, _ = _run(mini_town, wt, tl=LIGHT_YELLOW, speed=35.0)
    assert int(st_fast) != ST_YELLOW  # over 30 km/h: drive through


def test_hard_brake_zone(mini_town, wt):
    control, _, status, ctrl2, events = _run(mini_town, wt, obs=5.0, speed=20.0)
    assert int(status) == ST_BRAKE
    assert float(control[1]) == 0.0
    assert float(control[2]) >= 0.3
    assert bool(events["obstacle_brake"])
    assert bool(ctrl2.waiting_for_traffic)


def test_caution_zone_caps_throttle(mini_town, wt):
    # obs at 30 m, speed 15 -> caution (25 m * speed_factor 1.0=25)? obs=24 in caution
    control, _, status, ctrl2, _ = _run(mini_town, wt, nn=(0.0, 0.9, 0.0), obs=24.0, speed=14.0)
    assert int(status) == ST_OK
    assert not bool(ctrl2.waiting_for_traffic)


def test_governor_hard_cap(mini_town, wt):
    # 60 km/h in clear weather (cap 45): strong brake
    control, _, status, _, _ = _run(mini_town, wt, speed=60.0)
    assert float(control[2]) >= 0.89
    assert float(control[1]) == 0.0


def test_governor_accelerates_when_slow(mini_town, wt):
    control, _, _, _, _ = _run(mini_town, wt, nn=(0.0, 0.2, 0.0), speed=5.0)
    assert float(control[1]) >= 0.8  # deficit band: max(gas, 0.8)
    assert float(control[2]) == 0.0


def test_unstick_after_stopped(mini_town, wt):
    ctrl = init_ctrl_state()
    world = make_world(2, 1)
    # Stopped, not waiting for traffic, for > 3 s.
    world = world.replace(time_s=jnp.asarray(100.0))
    _, _, _, ctrl, _ = _run(mini_town, wt, speed=0.5, ctrl=ctrl, world=world)
    world2 = world.replace(time_s=jnp.asarray(104.0))
    control, _, status, _, _ = _run(mini_town, wt, speed=0.5, ctrl=ctrl, world=world2)
    assert int(status) == ST_UNSTICK
    assert float(control[1]) >= 0.69


def test_weather_scales_behavior(mini_town, wt):
    # Same speed, hardrain target is 20 -> brakes where clear cruises.
    world = make_world(2, 1).replace(time_s=jnp.asarray(50.0))
    c_clear, _, _, _, _ = _run(mini_town, wt, speed=33.0, world=world)
    world_hr = world.replace(weather_idx=jnp.asarray(4))
    c_hr, _, _, _, _ = _run(mini_town, wt, speed=33.0, world=world_hr)
    assert float(c_hr[2]) > float(c_clear[2])  # hardrain brakes harder


def test_intersection_brake_suppression(mini_town, wt):
    control, _, _, _, _ = _run(mini_town, wt, nn=(0.0, 0.1, 0.6), cmd=1, hint=0.3, obs=999.0, speed=15.0)
    # phantom brake suppressed, throttle boosted
    assert float(control[2]) == 0.0
    assert float(control[1]) > 0.0


def test_smoothing_weighted_average():
    st = init_smoothing()
    vals = [1.0, 1.0, 1.0, 1.0, 1.0]
    for v in vals:
        st, sm_steer, sm_thr = smooth_controls(st, jnp.asarray(v), jnp.asarray(v))
    np.testing.assert_allclose(float(sm_steer), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(sm_thr), 1.0, atol=1e-6)
    # Push a 0: weighted mean = sum(w[:-1]*1)/1 = 0.7
    st, sm_steer, sm_thr = smooth_controls(st, jnp.asarray(0.0), jnp.asarray(0.0))
    np.testing.assert_allclose(float(sm_steer), 0.7, atol=1e-6)
    np.testing.assert_allclose(float(sm_thr), 0.8, atol=1e-6)


def test_smoothing_partial_window():
    st = init_smoothing()
    st, sm_steer, _ = smooth_controls(st, jnp.asarray(0.5), jnp.asarray(0.5))
    # Only one frame seen: average of that frame alone.
    np.testing.assert_allclose(float(sm_steer), 0.5, atol=1e-6)


def test_controller_vmappable(mini_town, wt):
    B = 4
    world = make_world(2, 1).replace(time_s=jnp.asarray(50.0))
    worlds = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), world)
    ctrls = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_ctrl_state())

    def f(w, c, speed):
        return safety_controller(
            mini_town, w, c, wt,
            jnp.asarray(0.0), jnp.asarray(0.5), jnp.asarray(0.0),
            speed, jnp.asarray(0, jnp.int32), jnp.asarray(0.0),
            jnp.asarray(999.0), jnp.asarray(LIGHT_NONE, jnp.int32),
        )

    speeds = jnp.array([5.0, 20.0, 40.0, 60.0])
    control, reverse, status, ctrl2, events = jax.vmap(f)(worlds, ctrls, speeds)
    assert control.shape == (B, 3)
    a = np.asarray(control)
    assert a[0, 1] >= 0.8  # slow -> accelerate
    assert a[3, 2] >= 0.89  # way over cap -> brake hard


def test_red_queue_holds_escalation(mini_town, wt):
    """Queued behind a red OUTSIDE the 15 m obey gate (red_ahead): the
    overtake/reverse trigger and the waiting-for-traffic clock must hold —
    a lawful queue wait can never escalate into the reverse-teleport fallback
    (the round-4 Clear-benchmark rescues, runs/benchmark_r4g.json)."""
    ctrl = init_ctrl_state().replace(
        obstacle_wait_start=jnp.asarray(30.0, jnp.float32),
        traffic_wait_start=jnp.asarray(30.0, jnp.float32),
        waiting_for_traffic=jnp.asarray(True),
    )
    # Control arm: 20 s stopped behind an obstacle, no red in sight -> the
    # machine escalates (leaves OV_NONE toward a lane change or reverse).
    _, _, _, c_no, _ = _run(mini_town, wt, obs=8.0, speed=1.0, ctrl=ctrl)
    assert int(c_no.ov_state) != 0
    # Same state but the queue is light-bound: no escalation, clock released.
    _, _, _, c_red, _ = _run(mini_town, wt, obs=8.0, speed=1.0, ctrl=ctrl,
                             red_ahead=True)
    assert int(c_red.ov_state) == 0
    assert not bool(c_red.waiting_for_traffic)


def test_red_light_ahead_perception(mini_town):
    """red_light_ahead sees our lane's red up to 40 m out; the 15 m obey gate
    (check_traffic_light) correctly does NOT."""
    from cilrs_tpu.agent.perception import check_traffic_light, red_light_ahead
    from cilrs_tpu.maps.network import light_states

    lxy = np.asarray(mini_town.light_xy)
    lyaw = np.asarray(mini_town.light_yaw)
    ls = None
    for t in np.arange(0.0, 26.0, 1.0):
        cand = light_states(mini_town, jnp.asarray(t))
        if int(cand[0]) == LIGHT_RED:
            ls = cand
            break
    assert ls is not None
    fwd = np.array([np.cos(lyaw[0]), np.sin(lyaw[0])])
    pos25 = jnp.asarray((lxy[0] - fwd * 25.0).astype(np.float32))
    yaw0 = jnp.asarray(lyaw[0])
    assert bool(red_light_ahead(mini_town, ls, pos25, yaw0))
    assert int(check_traffic_light(mini_town, ls, pos25, yaw0)) != LIGHT_RED
    # All-green world: nothing ahead is red.
    assert not bool(red_light_ahead(
        mini_town, jnp.zeros_like(ls), pos25, yaw0))
    # 60 m out is beyond the queue-aware window.
    pos60 = jnp.asarray((lxy[0] - fwd * 60.0).astype(np.float32))
    assert not bool(red_light_ahead(mini_town, ls, pos60, yaw0))
