"""Data-collection CLI (collect_data.py parity, batched on device).

    python -m cilrs_tpu.cli.collect --frames 20000 --weather clear \
        --out data/session_001 --envs 16 --vehicles 12 --walkers 6
"""

from __future__ import annotations

import argparse

from cilrs_tpu.cli.common import build_map
from cilrs_tpu.config import WEATHER_NAMES, weather_index
from cilrs_tpu.data.collect import collect_session


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU fleet data collection")
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=20000)
    p.add_argument("--weather", default="clear", choices=list(WEATHER_NAMES))
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--vehicles", type=int, default=12)
    p.add_argument("--walkers", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--map", default="town01")
    p.add_argument("--format", default="npz", choices=["npz", "jpeg"])
    args = p.parse_args(argv)

    net = build_map(args.map)
    stats = collect_session(
        net, args.out, num_frames=args.frames, num_envs=args.envs,
        num_vehicles=args.vehicles, num_pedestrians=args.walkers,
        weather_idx=weather_index(args.weather), seed=args.seed,
        image_format=args.format,
    )
    print(f"\nDone: {stats['frames']} frames at {stats['frames_per_sec']:.0f} frames/s")
    print(f"Command distribution: {stats['command_distribution']}")
    return stats


if __name__ == "__main__":
    main()
