"""Page-residency discriminator: train on row BANDS of a CONTINUOUS 176k
collection whose content is bit-equal to the healthy r5e regime, but which
live in different physical pages.

  arm p2_band: rows [88128, 150000)  — 100% PAGE-2-resident, r5e-proven
               content (the continuous stream r5e trained on healthily)
  arm p1_band: rows [26000, 88128)   — same-size PAGE-1-resident control

Same val split (full table) for both. If p1 is healthy and p2 collapses,
page-2 residency itself poisons training DESPITE bit-exact batches
(train_gather_probe) — a compiled-program property below every functional
audit. If both are healthy, the >150k tail content of the continuous world
is the poison after all (and sessions mis-fixed it).

Collection is forced CONTINUOUS so page-2 content equals r5e's stream.

Usage: PYTHONPATH=... python tools/exp_band_arms.py
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ["CILRS_TPU_CONTINUOUS_COLLECT"] = "1"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bands", nargs="*", default=None,
                   help="explicit lo:hi row bands (overrides the default "
                        "page-aligned arms), e.g. 88128:150000 26000:88128")
    p.add_argument("--out", default="runs/band_arms.json")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache(); require_accelerator()
    from dataclasses import replace

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.train.loop import train

    net = build_map("town01")
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    page_rows = stats["page_rows"]
    print(f"page_rows={page_rows}")
    cfg = load_train_config()
    cfg = replace(cfg, training=replace(cfg.training, epochs=args.epochs))
    ds = labels_dataset(labels)
    N = args.frames
    rows = np.arange(N)
    if args.bands:
        arms = {}
        for b in args.bands:
            lo, hi = (int(x) for x in b.split(":"))
            arms[f"band_{lo}-{hi}"] = (rows >= lo) & (rows < hi)
    else:
        arms = {
            "p2_band_88k-150k": (rows >= page_rows) & (rows < 150_000),
            "p1_band_26k-88k": (rows >= 26_000) & (rows < page_rows),
        }
    out = {}
    for name, mask in arms.items():
        print(f"=== arm {name} ({mask.sum()} rows) ===", flush=True)
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
