"""Train-split SIZE bisect on one fixed 176k paged table.

Complements exp_row_region (region-restricted arms at equal size): here the
arms are random train-split subsamples of increasing SIZE at identical
full-range membership distribution (max_train_frames, train/loop.py), with
the val split fixed across arms. Brackets the collapse threshold in train
rows when content/region/reads are exonerated (runs/cross_eval.json).

Usage: PYTHONPATH=... python tools/exp_size_bisect.py --sizes 100000 127500 140000
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
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[100_000, 127_500, 149_817])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/size_bisect.json")
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
    out = {}
    for size in args.sizes:
        name = f"size_{size}"
        print(f"=== arm {name} ===", flush=True)
        t0 = time.time()
        res = train(ds, cfg, verbose=True, resident=dict(table),
                    max_train_frames=size)
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
