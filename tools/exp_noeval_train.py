"""Behavioral eval-causality test: train the collapsing 176k configuration
with epoch-end validation DISABLED for the first 6 epochs (train/loop.py
eval_every), then validate once at epoch 7.

If the interleaved eval dispatch is what poisons >150k training (the round-6
suspicion after cross_eval/row_region/label_structure/train_gather_probe/
page2_identity cleared content, labels, and the train dispatch), the
eval-free epochs must train healthily and the single epoch-7 validation will
read ~r5e-level turn errors (LEFT ~0.02-0.04) instead of the collapsed
0.072-0.078 plateau of r5f/r6a.

Usage: PYTHONPATH=... python tools/exp_noeval_train.py
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--epochs", type=int, default=7)
    p.add_argument("--eval-every", type=int, default=7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/noeval_train.json")
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
    # ckpt saved so the INDEPENDENTLY-verified scorer (tools/exp_cross_eval
    # --ckpt runs/noeval/ckpt) can measure the model outside the loop's own
    # eval program — if that program corrupts measurements, the epoch-7 val
    # here would read broken even over healthy training.
    res = train(ds, cfg, verbose=True, resident=dict(table),
                eval_every=args.eval_every, ckpt_dir="runs/noeval/ckpt")
    h = res["history"]
    out = {
        "frames": args.frames,
        "eval_every": args.eval_every,
        "history": h,
        "final": h[-1],
        "wall_s": time.time() - t0,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nfinal epoch: val {h[-1]['val_loss']:.4f} "
          f"LEFT {h[-1]['steer_err_LEFT']:.4f} "
          f"RIGHT {h[-1]['steer_err_RIGHT']:.4f}")
    print("reference points: r5e epoch-7 LEFT 0.019 (healthy) | "
          "r6a epoch-7 LEFT 0.078 (collapsed)")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
