"""Autopilot teacher: route-following expert used for data collection.

Replaces CARLA's built-in autopilot that generates the reference's training
labels (model/collect_data.py:273-278: autopilot at a 30 km/h target via the
TrafficManager speed-difference trick). Pure-pursuit steering on the planned
route + proportional speed control + obstacle/traffic-light gating; its outputs
are both applied to the ego AND recorded as the behavior-cloning labels
(steer/throttle/brake), exactly as the reference records `vehicle.get_control()`.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.core.geometry import wrap_angle
from cilrs_tpu.maps.network import LIGHT_RED, LIGHT_YELLOW
from cilrs_tpu.maps.routing import Route

TARGET_SPEED_KMH = 30.0  # reference collect_data.py Config.TARGET_SPEED
_PROJ_WINDOW = 6  # segments around route_idx searched for the closest point


def _localize_continuous(route: Route, route_idx: jnp.ndarray, pos: jnp.ndarray):
    """Fractional route position + tracking errors: project pos onto the
    polyline segments around route_idx. Integer-waypoint localization makes
    targets (and so the steer labels) JUMP each time argmin advances a
    waypoint; BC inherits that jitter as label noise.

    Returns (s, e_lat, tang_yaw): fractional index, signed lateral offset from
    the route (left +), and the route tangent heading at s."""
    last = route.length - 1
    cand = jnp.clip(route_idx + jnp.arange(-2, _PROJ_WINDOW), 0, last - 1)
    a = route.xy[cand]
    b = route.xy[jnp.minimum(cand + 1, last)]
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-8)
    t = jnp.clip(jnp.sum((pos - a) * ab, axis=-1) / denom, 0.0, 1.0)
    p = a + t[:, None] * ab
    d2 = jnp.sum((p - pos) ** 2, axis=-1)
    k = jnp.argmin(d2)
    abk = ab[k]
    seg_len = jnp.sqrt(jnp.sum(abk * abk) + 1e-12)
    tang = abk / seg_len
    rel = pos - a[k]
    e_lat = tang[0] * rel[1] - tang[1] * rel[0]  # left of route +
    chord_yaw = jnp.arctan2(tang[1], tang[0])
    return cand[k].astype(jnp.float32) + t[k], e_lat, chord_yaw, seg_len


def _interp_route(route: Route, s: jnp.ndarray) -> jnp.ndarray:
    """Point on the route polyline at fractional index s."""
    last = route.length - 1
    s = jnp.clip(s, 0.0, last.astype(jnp.float32))
    i0 = jnp.floor(s).astype(jnp.int32)
    frac = s - i0.astype(jnp.float32)
    return (route.xy[i0] * (1.0 - frac)
            + route.xy[jnp.minimum(i0 + 1, last)] * frac)


def autopilot_controls(
    route: Route,
    route_idx: jnp.ndarray,
    pos: jnp.ndarray,
    yaw: jnp.ndarray,
    speed_kmh: jnp.ndarray,
    obs_dist: jnp.ndarray,
    tl_state: jnp.ndarray,
    target_speed_kmh: float = TARGET_SPEED_KMH,
):
    """Returns (steer, throttle, brake) in the same ranges the model learns."""
    last = route.length - 1

    # Steering = curvature FEEDFORWARD + DEADBANDED pure-pursuit correction.
    # The route carries exact per-interval curvature (maps.routing._path_kappa
    # over circular-fillet connectors): piecewise constant, zero on straights.
    # The bicycle-model feedforward delta = atan(L*kappa) is then a flat
    # plateau through every corner arc with a one-interval (2 m) ramp — the
    # label-flatness that lets the reference clone CARLA's lateral-PID turns
    # to MAE 0.004 (its PID holds a steady wheel angle through the arc).
    sel, e_lat, chord_yaw, seg_len = _localize_continuous(route, route_idx, pos)
    s = jnp.clip(sel, 0.0, last.astype(jnp.float32))
    i = jnp.floor(s).astype(jnp.int32)
    frac = s - i.astype(jnp.float32)

    # Interpolated along the fractional route position: integer sampling makes
    # the feedforward flicker each time the nearest waypoint advances.
    kappa = (route.kappa[jnp.minimum(i, last)] * (1.0 - frac)
             + route.kappa[jnp.minimum(i + 1, last)] * frac)
    WHEELBASE, MAX_STEER = 2.9, 0.6109  # core.state.default_vehicle_params
    steer_ff = jnp.arctan(WHEELBASE * kappa) / MAX_STEER
    # Correction is Stanley-style (cross-track + heading vs the CONTINUOUS
    # route projection) and DEADBANDED. Unlike a lookahead-point pursuit term
    # — whose chord-heading error is systematically nonzero on arcs and
    # sawtooths as the integer target advances — both error terms are exactly
    # zero whenever the car tracks the route, so the label IS the feedforward:
    # 0 on straights, the flat plateau in corners. Without the deadband every
    # well-tracked frame carries a tiny pose-dependent residual (~0.01 steer)
    # that an 88x200 image cannot resolve — precisely the LANEFOLLOW MAE gap
    # vs the reference (0.0119 vs 0.0041, evaluation_report_tpu.json r2).
    def _db(x, band):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - band, 0.0)

    # Single heading loop (no independent position gain, which limit-cycles
    # against the deadband): the recovery heading converges to the route
    # exponentially — e_lat + when LEFT of the route pulls the target heading
    # right — and one proportional gain drives yaw to it. At perfect tracking
    # the whole correction is exactly 0.
    v_ms = jnp.maximum(speed_kmh / 3.6, 2.0)
    # The localized chord heading is piecewise constant per 2 m segment; on an
    # arc it jumps by kappa*ds (~0.25 rad) at every waypoint, which sawtooths
    # straight into the correction. The chord equals the true tangent at the
    # segment MIDPOINT, so correcting by (frac - 0.5)*kappa*ds recovers the
    # continuous tangent heading.
    tang_yaw = chord_yaw + (frac - 0.5) * kappa * seg_len
    psi_err = wrap_angle(tang_yaw - yaw) + jnp.arctan(-0.9 * e_lat / v_ms)
    # WIDER deadband inside corner arcs: the dynamics lag the feedforward by
    # an entry-pose-dependent amount, so with the straightaway 0.02 band the
    # correction chatters all through the turn — repeat passes through the
    # same junction then carry different labels (measured big-steer label
    # floor 0.0141 MAE, runs/noise_floor_r3.txt, vs the reference teacher's
    # ~0.004: CARLA's lateral PID holds one steady wheel angle per arc). At
    # 0.06 rad the label IS the flat plateau for any normally-tracked pass;
    # Stanley still rescues genuinely wide entries.
    band = jnp.where(jnp.abs(steer_ff) > 0.08, 0.06, 0.02)
    corr = jnp.clip(0.8 * _db(psi_err, band), -0.5, 0.5)
    steer = jnp.clip(steer_ff + corr, -1.0, 1.0)

    # Upcoming-turn awareness: drop to the 18 km/h intersection speed on a
    # SHARP bend threshold. Piecewise-CONSTANT targets are the point: the
    # model's only hidden variable is then WHICH plateau is active (a salient,
    # nearly-discrete visual event — junction approach), not a continuous
    # curvature estimate. A smooth bend->target ramp looks friendlier but makes
    # every approach frame's throttle proportional to a quantity an 88x200
    # image resolves poorly, which shows up directly as throttle label loss.
    i = jnp.floor(s).astype(jnp.int32)
    ahead_yaw = route.yaw[jnp.minimum(i + 6, last)]
    bend = jnp.abs(wrap_angle(ahead_yaw - route.yaw[jnp.minimum(i, last)]))
    target_speed_kmh = jnp.where(bend > 0.3, 18.0, target_speed_kmh)

    # Speed control: SATURATING high-gain law (like TM's PID riding its output
    # limits). Throttle sits at the 0.62 plateau until v is within BAND of the
    # target, then ramps linearly to 0. Speed is an exact model input, so
    # given the active plateau the whole law is perfectly learnable — the
    # plateau shape puts ~zero label entropy on the majority of frames, which
    # is exactly the structure behind the reference's throttle MAE of 0.017
    # with RMSE 0.059 (flat almost everywhere, rare transitions).
    band = 5.0  # km/h: linear strip below target where throttle feathers out
    v_gap = target_speed_kmh - speed_kmh
    throttle = 0.62 * jnp.clip(v_gap / band, 0.0, 1.0)
    # Brake engages just past the target so turn entries actually reach the
    # 18 km/h plateau before the corner (late soft braking lets the ego carry
    # 21+ into 90-degree turns — the resulting wide/corrective pose
    # distribution is where steer label error concentrates).
    brake = 0.5 * jnp.clip((-v_gap - 1.0) / 3.0, 0.0, 1.0)

    # Transient ease-off: cut throttle (and brake on extreme error) only when
    # the TRACKING error is large at speed — post-teleport/entry transients.
    # In normal driving psi_err sits inside the deadband, so this contributes
    # exactly zero label variance; corner speed itself is governed by the
    # piecewise-constant bend plateau above.
    corneriness = jnp.clip((jnp.abs(psi_err) - 0.2) * 5.0, 0.0, 1.0)
    fast = jnp.clip((speed_kmh - 14.0) / 8.0, 0.0, 1.0)
    throttle = throttle * (1.0 - corneriness * fast)
    brake = jnp.maximum(brake, jnp.clip((jnp.abs(psi_err) - 0.5) * 2.0, 0.0, 1.0) * 0.3)

    # Obstacle gating: decisive CLOSE-RANGE follow/brake (TM keeps a ~3 m gap
    # and brakes firmly when closing). Short range is where a leader fills the
    # frame and its distance is precisely legible; long smooth slow-down ramps
    # make half the cruise frames depend on a fuzzy 30 m distance estimate.
    gate = 7.0 + 0.25 * speed_kmh  # ~14.5 m at 30 km/h
    throttle = throttle * jnp.clip((obs_dist - gate) / 3.0, 0.0, 1.0)
    # PLATEAU brake, not a gate-wide ramp: the old 0.9*(1 - d/gate) law spread
    # the label over the full ~14.5 m gate, so cloning it needed sub-meter
    # distance regression on every braking frame (residuals_r3_flagship.json:
    # brake MAE 0.166 in the throttle-zero segment, corr 0.951 vs the
    # reference's 0.9815 — CARLA TM's brake is near-binary). Now the label is
    # a flat 0.85 everywhere inside the gate except a 3 m onset strip: one
    # legible discrete event (leader inside the gate) instead of a continuous
    # distance readout. Same onset distance, firmer stop — closed-loop gap
    # behavior is unchanged (throttle already cuts at the same gate).
    brake = jnp.maximum(brake, 0.85 * jnp.clip((gate - obs_dist) / 3.0, 0.0, 1.0))

    # Traffic lights: stop on red, and on yellow when still slow enough.
    red = tl_state == LIGHT_RED
    yellow_stop = (tl_state == LIGHT_YELLOW) & (speed_kmh < 30.0)
    gate = red | yellow_stop
    throttle = jnp.where(gate, 0.0, throttle)
    brake = jnp.where(gate, 0.8, brake)

    return steer, jnp.clip(throttle, 0.0, 1.0), jnp.clip(brake, 0.0, 1.0)
