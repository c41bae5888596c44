"""Per-region IMAGE statistics of a 176k collection — the last unmeasured
axis after labels (identical), reads (bit-exact), and compute (bit-faithful)
were all exonerated: do the >150k / page-2 frames form a distinct VISUAL
domain that poisons joint turn training at any mixing fraction?

Samples rows per (region x weather) cell via the production paged gather and
reports mean/std brightness, per-channel means, and the fraction of
saturated pixels. A systematic shift (e.g. renderer state drifting with sim
time, or a fresh-session difference) would split turn supervision into two
visually-discriminable domains.

Usage: PYTHONPATH=... python tools/exp_image_stats.py
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--per-cell", type=int, default=240)
    p.add_argument("--out", default="runs/image_stats.json")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache(); require_accelerator()
    import jax.numpy as jnp

    from cilrs_tpu.data.resident import collect_resident
    from cilrs_tpu.ops.gather import gather_rows_paged

    net = build_map("town01")
    table, labels, _ = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    page_rows = int(table["page_rows"])
    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))

    N = args.frames
    rows = np.arange(N)
    env = labels["env"]
    weather = env % 5
    regions = {
        "early_<80k": rows < 80_000,
        "mid_80-150k": (rows >= 80_000) & (rows < 150_000),
        "tail_>=150k": rows >= 150_000,
    }
    WNAMES = ["clear", "rain", "fog", "night", "hardrain"]
    rng = np.random.RandomState(0)
    out = {}
    print(f"{'region':14s} {'weather':9s} {'mean':>7s} {'std':>7s} "
          f"{'R':>6s} {'G':>6s} {'B':>6s} {'sat%':>6s}")
    for rname, rsel in regions.items():
        out[rname] = {}
        for w in range(5):
            sel = np.nonzero(rsel & (weather == w))[0]
            if len(sel) == 0:
                continue
            pick = np.sort(rng.choice(sel, min(args.per_cell, len(sel)),
                                      replace=False))
            imgs = np.asarray(gather_rows_paged(
                table["images"], jnp.asarray(pick), page_rows))[:, :D]
            imgs = imgs.reshape((-1,) + img_shape).astype(np.float32)
            m = {
                "n": len(pick),
                "mean": float(imgs.mean()),
                "std": float(imgs.std()),
                "rgb": [float(imgs[..., c].mean()) for c in range(3)],
                "sat_frac": float(np.mean(imgs >= 250.0)),
            }
            out[rname][WNAMES[w]] = m
            print(f"{rname:14s} {WNAMES[w]:9s} {m['mean']:7.2f} {m['std']:7.2f} "
                  f"{m['rgb'][0]:6.1f} {m['rgb'][1]:6.1f} {m['rgb'][2]:6.1f} "
                  f"{100 * m['sat_frac']:6.2f}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
