import jax.numpy as jnp
import numpy as np

from cilrs_tpu.config import load_scoring_config
from cilrs_tpu.evaluation import compute_scores, format_report, init_metrics, update_metrics


def _tick(m, now, **kw):
    defaults = dict(
        speed_kmh=jnp.asarray(20.0), steer=jnp.asarray(0.0),
        on_road=jnp.asarray(True), dt=0.05, now=jnp.asarray(now),
        hit_vehicle=jnp.asarray(False), hit_walker=jnp.asarray(False),
        red_light_stop=jnp.asarray(False), red_light_violation=jnp.asarray(False),
        obstacle_brake=jnp.asarray(False), route_completed=jnp.asarray(False),
        route_attempted=jnp.asarray(False), teleported=jnp.asarray(False),
        recovered=jnp.asarray(False),
    )
    for k, v in kw.items():
        defaults[k] = jnp.asarray(v)
    return update_metrics(m, **defaults)


def test_perfect_run_scores_100():
    # Pinned-destination protocol: one attempt (init), one completion.
    m = init_metrics()
    for i in range(100):
        m = _tick(m, i * 0.05, route_completed=(i == 99))
    s = compute_scores(m)
    assert s["safety"] == 100.0
    assert s["comfort"] == 100.0
    assert s["route_completion"] == 100.0
    assert s["overall"] == 100.0
    assert s["grade"].startswith("A+")


def test_collision_penalty_and_cooldown():
    m = init_metrics()
    # Collision signaled for 10 consecutive ticks -> cooldown counts it once.
    for i in range(10):
        m = _tick(m, i * 0.05, hit_vehicle=True)
    assert float(np.asarray(m.collisions).sum()) == 1.0
    # After 3 s the cooldown expires -> second collision counts.
    m = _tick(m, 4.0, hit_vehicle=True)
    assert float(np.asarray(m.collisions).sum()) == 2.0
    s = compute_scores(m)
    assert s["safety"] == 100.0 - 2 * 15.0


def test_comfort_jerk():
    m = init_metrics()
    steers = [0.0, 0.1, 0.0, 0.1]  # avg jerk 0.075 after 4 frames
    for i, st in enumerate(steers):
        m = _tick(m, i * 0.05, steer=st)
    s = compute_scores(m)
    np.testing.assert_allclose(s["avg_jerk"], 0.075, atol=1e-6)
    np.testing.assert_allclose(s["comfort"], 100.0 - 0.075 * 1000, atol=1e-3)


def test_off_road_and_red_light_penalties():
    m = init_metrics()
    for i in range(10):
        m = _tick(m, i * 0.05, on_road=(i >= 5))  # 50% off-road
    s = compute_scores(m)
    np.testing.assert_allclose(s["safety"], 100.0 - 0.5 * 40.0, atol=1e-5)
    m = _tick(m, 1.0, red_light_violation=True)
    s2 = compute_scores(m)
    assert s2["red_light_violations"] == 1.0
    assert s2["safety"] < s["safety"]


def test_overall_weighting_matches_reference_formula():
    cfg = load_scoring_config()
    m = init_metrics()
    for i in range(20):
        m = _tick(m, i * 0.05, steer=0.01 * (i % 2))
    m = _tick(m, 1.1, route_completed=True, route_attempted=True)
    s = compute_scores(m, cfg)
    expect = s["safety"] * 0.6 + s["comfort"] * 0.3 + s["route_completion"] * 0.1
    np.testing.assert_allclose(s["overall"], expect, atol=1e-6)


def test_report_formats():
    m = init_metrics()
    for i in range(10):
        m = _tick(m, i * 0.05)
    rep = format_report(compute_scores(m))
    assert "EVALUATION REPORT" in rep
    assert "Overall score" in rep
    assert "Grade" in rep


def test_grades():
    cfg = load_scoring_config()
    from cilrs_tpu.evaluation.scoring import GRADE_FALLBACK

    m = init_metrics()
    for i in range(10):
        m = _tick(m, i * 0.05)
    # 7 collisions: safety 0 -> overall = 0.3*100 + 0 = 30 -> C
    for k in range(7):
        m = _tick(m, 10.0 + k * 4.0, hit_vehicle=True)
    s = compute_scores(m, cfg)
    assert s["grade"] == GRADE_FALLBACK
