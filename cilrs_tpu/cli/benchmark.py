"""5-weather closed-loop benchmark -> markdown report.

Reproduces the reference's evaluation protocol (RESULTS.md:151-165 /
output/weather_benchmarks.md): for each of clear/rain/fog/night/hardrain, run
spawn -> destination with NPC traffic and score with Safety*0.6 + Comfort*0.3 +
Route*0.1, then emit a RESULTS.md-style table.

    python -m cilrs_tpu.cli.benchmark --checkpoint runs/cilrs --out RESULTS_tpu.md \
        --spawn 0 --destination 50 --vehicles 40 --pedestrians 5
"""

from __future__ import annotations

import argparse
import json
import time

from cilrs_tpu.cli import drive as drive_cli
from cilrs_tpu.config import WEATHER_NAMES

WEATHER_LABELS = {
    "clear": "Clear", "rain": "Rain", "fog": "Fog",
    "night": "Night", "hardrain": "Hard Rain",
}


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU 5-weather benchmark")
    p.add_argument("--checkpoint", default=None)
    # Duration cap pro-rata to route length: the reference caps ~0.5 km routes
    # at 289-384 s (RESULTS.md:12-16) — its own Hard-Rain run AVERAGED
    # 4.7 km/h and completed only because the route was short. This protocol's
    # 1,285 m route at that pace needs ~984 s; 600 s is still stricter than
    # pro-rata (the old 480 s made Hard Rain structurally impossible at its
    # own 20 km/h weather cap with traffic: 8 red stops + 118 s of
    # obstacle-braking leaves < the required moving time).
    p.add_argument("--duration", type=float, default=600.0)
    # Default = the LONGEST spawn-pair route in town01 (1,285 m, ~2.3x the old
    # 0->50 557 m protocol) so run difficulty is comparable to the
    # reference's routes.
    p.add_argument("--spawn", type=int, default=249)
    p.add_argument("--destination", type=int, default=219)
    p.add_argument("--vehicles", type=int, default=40)
    p.add_argument("--pedestrians", type=int, default=5)
    p.add_argument("--map", default="town01")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="RESULTS_tpu.md")
    p.add_argument("--json-out", default=None)
    p.add_argument("--autopilot", action="store_true")
    p.add_argument("--weathers", nargs="*", default=list(WEATHER_NAMES))
    p.add_argument("--events-dir", default=None,
                   help="write per-weather rescue/collision event JSONs here")
    args = p.parse_args(argv)
    if args.events_dir:
        import os
        os.makedirs(args.events_dir, exist_ok=True)

    results = {}
    for weather in args.weathers:
        print(f"\n===== {weather} =====")
        drive_args = [
            "--duration", str(args.duration), "--spawn", str(args.spawn),
            "--destination", str(args.destination),
            "--vehicles", str(args.vehicles),
            "--pedestrians", str(args.pedestrians),
            "--weather", weather, "--map", args.map, "--seed", str(args.seed),
            "--no-hud",
        ]
        if args.autopilot:
            drive_args.append("--autopilot")
        elif args.checkpoint:
            drive_args += ["--checkpoint", args.checkpoint]
        if args.events_dir:
            drive_args += ["--events-json",
                           f"{args.events_dir}/events_{weather}.json"]
        results[weather] = drive_cli.main(drive_args)

    md = _format_markdown(results, args)
    with open(args.out, "w") as f:
        f.write(md)
    print(f"\nbenchmark report -> {args.out}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _format_markdown(results: dict, args) -> str:
    rows = []
    total = 0.0
    collisions = 0.0
    completed = 0
    teleports = 0.0
    recoveries = 0.0
    for w, s in results.items():
        rows.append(
            f"| {WEATHER_LABELS.get(w, w)} | {s['overall']:.1f} | {s['grade'].split()[0]} | "
            f"{s['collisions']:.0f} | {'yes' if s['routes_completed'] >= 1 else 'no'} | "
            f"{s.get('teleports', 0):.0f} | {s.get('recoveries', 0):.0f} | "
            f"{s.get('route_length_m', float('nan')):.0f} m | "
            f"{s['total_time_s']:.0f} s | {s['max_speed_kmh']:.1f} km/h |"
        )
        total += s["overall"]
        collisions += s["collisions"]
        teleports += s.get("teleports", 0)
        recoveries += s.get("recoveries", 0)
        completed += int(s["routes_completed"] >= 1)
    avg = total / max(len(results), 1)
    return "\n".join([
        "# CILRS-TPU 5-Weather Closed-Loop Benchmark",
        "",
        f"Protocol: spawn {args.spawn} -> destination {args.destination}, "
        f"{args.vehicles} NPC vehicles, {args.pedestrians} pedestrians, map {args.map}, "
        f"20 Hz, duration cap {args.duration:.0f} s. "
        f"Policy: {'rule-based autopilot' if args.autopilot else args.checkpoint or 'untrained'}.",
        "",
        # Teleports/recoveries are rescues the scoring formula (by reference
        # parity) cannot see — surfacing them per row keeps scores honest.
        "| Weather | Overall | Grade | Collisions | Destination | Teleports | Recoveries | Route | Time | Max speed |",
        "|---------|---------|-------|------------|-------------|-----------|------------|-------|------|-----------|",
        *rows,
        "",
        f"**Average score: {avg:.1f} / 100 — {collisions:.0f} total collisions — "
        f"{completed}/{len(results)} destinations reached — "
        f"{teleports:.0f} teleports, {recoveries:.0f} recoveries.**",
        "",
        f"_Scoring: Safety x0.6 + Comfort x0.3 + Route x0.1 "
        f"(reference formula, model/autonomous_drive.py:93-155). Generated {time.strftime('%Y-%m-%d %H:%M')}._",
    ])


if __name__ == "__main__":
    main()
