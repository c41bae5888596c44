"""Closed-loop driving / evaluation CLI.

Flag parity with the reference's argparse (model/autonomous_drive.py:1743-1770:
--checkpoint --duration --spawn --destination --vehicles --pedestrians --no-hud
--map) PLUS the documented-but-missing --weather flag (SURVEY.md §2.3 item 1).

    python -m cilrs_tpu.cli.drive --duration 120 --spawn 0 --destination 50 \
        --vehicles 40 --pedestrians 5 --weather clear --no-hud

The hot loop runs in jitted multi-tick chunks on device; the host only touches
frames/metrics at chunk boundaries (2 s of sim per transfer vs. the reference's
per-frame RPC+render round trip).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.agent.driver import DT, make_driver_state, rollout
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.cli.common import build_map, load_policy
from cilrs_tpu.config import (
    WEATHER_NAMES, load_scoring_config, load_weather_table, weather_index,
)
from cilrs_tpu.core.state import default_vehicle_params
from cilrs_tpu.evaluation import compute_scores, format_report
from cilrs_tpu.evaluation.hud import DashboardHUD, HAS_CV2, STATUS_NAMES
from cilrs_tpu.maps.routing import chained_route_pool, stack_routes, trace_route

CHUNK_TICKS = 40  # 2 s of sim per host round trip


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU closed-loop driving")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--duration", type=float, default=120.0, help="seconds of sim time")
    p.add_argument("--spawn", type=int, default=None)
    p.add_argument("--destination", type=int, default=None)
    p.add_argument("--vehicles", type=int, default=20)
    p.add_argument("--pedestrians", type=int, default=5)
    p.add_argument("--weather", default="clear", choices=list(WEATHER_NAMES))
    p.add_argument("--no-hud", action="store_true")
    p.add_argument("--map", default="town01")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-video", default=None, help="write HUD frames to mp4")
    p.add_argument("--report-json", default=None)
    p.add_argument("--events-json", default=None,
                   help="write tick-accurate rescue/collision events "
                        "(teleport cause, position, context) for diagnosis")
    p.add_argument("--depart-delay", type=float, default=0.0,
                   help="park the ego (full brake) for this many sim seconds "
                        "before departing — the departure-phase sweep for "
                        "red-wave resonance probes (keep < 15 s; the cap is "
                        "extended by the delay so moving time is unchanged)")
    p.add_argument("--autopilot", action="store_true",
                   help="drive with the rule-based teacher instead of the model")
    p.add_argument("--view", default="front", choices=["front", "chase"],
                   help="HUD/video viewpoint (chase = spectator cam, "
                        "reference :1612-1622)")
    args = p.parse_args(argv)

    t_setup = time.time()
    print(f"Map: {args.map}")
    net = build_map(args.map)
    print(f"  {net.num_waypoints} waypoints, {net.num_lights} lights "
          f"({time.time() - t_setup:.1f}s)", flush=True)
    rng = np.random.RandomState(args.seed)
    widx = weather_index(args.weather)
    wt = load_weather_table()
    params = default_vehicle_params()

    world, info = spawn_world(net, args.vehicles + 1, args.pedestrians, rng,
                              ego_spawn=args.spawn, weather_idx=widx,
                              seed=args.seed, return_info=True)
    from cilrs_tpu.maps.network import host_arrays
    spawns = host_arrays(net).spawn_wp
    ego_wp = info["ego_wp"]
    loop_routes = args.destination is None
    route_len_m = None
    if args.destination is not None:
        dest_wp = int(spawns[args.destination % len(spawns)])
        route = trace_route(net, ego_wp, dest_wp)
        if route is None:
            raise SystemExit("destination unreachable from spawn")
        pool = stack_routes([route])
        rxy = np.asarray(route.xy)[: int(route.length)]
        route_len_m = float(np.sum(np.hypot(*(rxy[1:] - rxy[:-1]).T)))
        print(f"  route: {int(route.length)} waypoints, {route_len_m:.0f} m "
              f"to spawn point {args.destination}")
    else:
        pool = chained_route_pool(net, rng, num_routes=6, start_wp=ego_wp)
    print(f"  routes ready ({time.time() - t_setup:.1f}s)", flush=True)

    mode = "collect" if args.autopilot else "drive"
    apply_fn, variables = (None, {})
    if not args.autopilot:
        apply_fn, variables = load_policy(args.checkpoint)

    state = make_driver_state(world)
    scoring = load_scoring_config()

    # net/pool/variables are traced ARGUMENTS: closing over them would bake
    # ~90 MB of constants into the program and cripple (remote) compilation.
    @jax.jit
    def roll(st, net_, pool_, variables_):
        if mode == "drive":
            def policy_fn(image, speed_norm, command):
                controls, _ = apply_fn(variables_, image, speed_norm, command, train=False)
                return controls
        else:
            policy_fn = None
        return rollout(st, steps=CHUNK_TICKS, net=net_, pool=pool_, wt=wt,
                       params=params, policy_fn=policy_fn, mode=mode,
                       want_frames=True, loop_routes=loop_routes,
                       hold_until_s=float(args.depart_delay))

    pool_end_xy = np.asarray(pool.xy[:, -1])  # host copy for HUD distance

    chase_render = None
    if args.view == "chase":
        from cilrs_tpu.maps.network import light_states
        from cilrs_tpu.render.camera import CHASE_CAMERA
        from cilrs_tpu.render.raster import render_frame as _rf

        chase_render = jax.jit(lambda w, net_: _rf(
            net_, w, light_states(net_, w.time_s), CHASE_CAMERA, include_ego=True))

    hud = None
    video = None
    if not args.no_hud and HAS_CV2:
        hud = DashboardHUD()
    compose_hud = DashboardHUD()  # also used headless for --save-video frames
    if args.save_video:
        import cv2

        video = cv2.VideoWriter(
            args.save_video, cv2.VideoWriter_fourcc(*"mp4v"),
            int(1 / DT / CHUNK_TICKS * 10), (960, 540),
        )

    print(f"Driving for {args.duration:.0f} s sim time, weather={args.weather} ...")
    if args.depart_delay > 0.0:
        print(f"  departure-phase hold: {args.depart_delay:.0f} s "
              f"(cap extended to {args.duration + args.depart_delay:.0f} s)")
    total_ticks = int((args.duration + args.depart_delay) / DT)
    done_ticks = 0
    t_wall = time.time()
    running = True
    TP_CAUSES = {1: "collision-escalate", 2: "stuck-still", 3: "traffic-wait",
                 4: "hard-stuck", 5: "off-road", 6: "reverse-fallback"}
    events = [] if args.events_json else None
    prev_collisions = 0.0
    while done_ticks < total_ticks and running:
        state, outs = roll(state, net, pool, variables)
        done_ticks += CHUNK_TICKS
        scores = compute_scores(state.metrics, scoring)
        if events is not None:
            tpc = np.asarray(outs["tp_cause"])
            rec = np.asarray(outs["recovered"])
            pos = np.asarray(outs["pos"])
            base_t = (done_ticks - CHUNK_TICKS) * DT

            def _ctx(k):
                return {
                    "t_s": round(base_t + float(k) * DT, 2),
                    "pos_before": [round(float(pos[max(k - 1, 0), 0]), 1),
                                   round(float(pos[max(k - 1, 0), 1]), 1)],
                    "pos_after": [round(float(pos[k, 0]), 1),
                                  round(float(pos[k, 1]), 1)],
                    "speed_kmh": round(float(outs["speed_kmh"][k]), 1),
                    "obstacle_dist": round(float(outs["obstacle_dist"][k]), 1),
                    "tl_state": int(outs["tl_state"][k]),
                    "command": int(outs["command"][k]),
                    "status": STATUS_NAMES.get(int(outs["status"][k]), "?"),
                }

            for k in np.nonzero(tpc)[0]:
                events.append({"type": "teleport",
                               "cause": TP_CAUSES.get(int(tpc[k]), "?"),
                               **_ctx(int(k))})
            for k in np.nonzero(rec)[0]:
                events.append({"type": "recovery", **_ctx(int(k))})
            if scores["collisions"] > prev_collisions:
                events.append({"type": "collision",
                               "count": scores["collisions"],
                               **_ctx(CHUNK_TICKS - 1)})
            prev_collisions = scores["collisions"]
        # Pinned-destination protocol: arrival parks the car and freezes the
        # metrics (driver.py), so further chunks are dead time — stop early.
        if not loop_routes and bool(state.route_done):
            print("  destination reached")
            break

        if hud is not None or video is not None:
            if chase_render is not None:
                frame = np.asarray(chase_render(state.world, net))
            else:
                frame = np.asarray(outs["frame"][-1])
            canvas = DashboardHUD.compose(
                hud or compose_hud,
                frame,
                speed_kmh=float(outs["speed_kmh"][-1]),
                command=int(outs["command"][-1]),
                steer=float(outs["control"][-1, 0]),
                throttle=float(outs["control"][-1, 1]),
                brake=float(outs["control"][-1, 2]),
                tl_state=int(outs["tl_state"][-1]),
                obstacle_dist=float(outs["obstacle_dist"][-1]),
                dest_remaining_m=float(np.linalg.norm(
                    pool_end_xy[int(state.route_id)] - np.asarray(outs["pos"][-1]))),
                status=int(outs["status"][-1]),
                safety_pct=scores["safety"],
                distance_m=scores["total_distance_m"],
                collisions=int(scores["collisions"]),
                weather=args.weather,
            )
            if video is not None:
                video.write(canvas)
            if hud is not None:
                running = hud.show(canvas)

        # 2-s status line (reference :1639-1652).
        st = STATUS_NAMES.get(int(outs["status"][-1]), "?")
        sim_t = done_ticks * DT
        rtf = sim_t / max(time.time() - t_wall, 1e-9)
        print(f"  t={sim_t:6.1f}s  v={float(outs['speed_kmh'][-1]):5.1f} km/h  "
              f"cmd={int(outs['command'][-1])}  {st:10s}  "
              f"score={scores['overall']:5.1f}  ({rtf:4.1f}x realtime)")

    if video is not None:
        video.release()
    if hud is not None:
        hud.close()

    scores = compute_scores(state.metrics, scoring)
    if route_len_m is not None:
        scores["route_length_m"] = route_len_m
    wall = time.time() - t_wall
    print(f"\nAvg sim rate: {done_ticks / wall:.1f} ticks/s ({done_ticks * DT / wall:.1f}x realtime)")
    print(format_report(scores))
    if args.report_json:
        with open(args.report_json, "w") as f:
            json.dump({"weather": args.weather, **scores}, f, indent=2)
        print(f"report written to {args.report_json}")
    if events is not None:
        with open(args.events_json, "w") as f:
            json.dump(events, f, indent=1)
        print(f"{len(events)} events -> {args.events_json}")
    return scores


if __name__ == "__main__":
    main()
