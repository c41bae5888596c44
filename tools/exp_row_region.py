"""Row-region content probe for the >150k collapse: train on ONLY the early
rows vs ONLY the late rows of one 176k paged collection (same train-set
size, same val split) and compare turn-steer errors.

If late-row-only training collapses while early-row-only is healthy, the
high rows carry poisonous (image,label) content that every distational audit
missed; if both arms behave the same, content is exonerated and the trigger
is combinatorial/systems (RESULTS_training.md round 5).

Usage: PYTHONPATH=/root/repo python tools/exp_row_region.py [--frames 176256]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--train-rows", type=int, default=80_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/row_region.json")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache(); require_accelerator()
    from dataclasses import replace

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.train.loop import train

    net = build_map("town01")
    table, labels, _ = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    cfg = load_train_config()
    cfg = replace(cfg, training=replace(cfg.training, epochs=args.epochs))
    ds = labels_dataset(labels)
    N = args.frames
    arms = {
        "early_only": np.arange(N) < args.train_rows,
        "late_only": np.arange(N) >= (N - args.train_rows),
    }
    out = {}
    for name, mask in arms.items():
        print(f"=== arm {name} ===", flush=True)
        t0 = time.time()
        res = train(ds, cfg, verbose=True, resident=dict(table),
                    train_row_mask=mask)
        h = res["history"]
        out[name] = {
            "best_val": res["best_val_loss"],
            "left_err_last": h[-1]["steer_err_LEFT"],
            "right_err_last": h[-1]["steer_err_RIGHT"],
            "history": h,
            "wall_s": time.time() - t0,
        }
        print(f"arm {name}: best_val {res['best_val_loss']:.4f} "
              f"LEFT {h[-1]['steer_err_LEFT']:.4f} "
              f"RIGHT {h[-1]['steer_err_RIGHT']:.4f}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
