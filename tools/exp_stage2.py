"""Two-stage curriculum validation: widen a turn-LATCHED model to the full
176k split.

Round-6 finding: turn learning is bistable — from scratch, every 176k-split
training stream tested (seeds 42/43/137/1009, any row-subset except
rows{0-80k}) settles into the predict-the-mean basin (LEFT err 0.05-0.10),
while the 150k seed-42 stream latches (LEFT -> 0.01). If the latched basin
is STABLE under continued training on the full 176k split, a two-stage
curriculum (latch on the proven 150k recipe, then widen) lands the
reference-scale run.

This arm initializes from the proven flagship params (runs/r5e/ckpt best
slot) and trains the FULL 176k split for --epochs. Turn errors staying at
latched levels (LEFT ~0.02) while val_loss improves = curriculum works.

Usage: PYTHONPATH=... python tools/exp_stage2.py [--init runs/r5e/ckpt]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init", default="runs/r5e/ckpt")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--out", default="runs/stage2.json")
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
    t0 = time.time()
    res = train(ds, cfg, verbose=True, resident=dict(table),
                init_from=args.init, ckpt_dir=args.ckpt_dir)
    h = res["history"]
    out = {"frames": args.frames, "init": args.init, "history": h,
           "best_val": res["best_val_loss"], "wall_s": time.time() - t0}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nfinal: val {h[-1]['val_loss']:.4f} "
          f"LEFT {h[-1]['steer_err_LEFT']:.4f} "
          f"RIGHT {h[-1]['steer_err_RIGHT']:.4f}")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
