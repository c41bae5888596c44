"""Offline evaluation report for a RESIDENT-pipeline checkpoint, standalone.

The resident pipeline keeps frames in HBM only (data/resident.py) — when the
training process exits, the table is gone, but the on-device simulator is
deterministic given (seed, frames, envs, vehicles, walkers): re-collecting
reproduces the exact same frames + labels. This tool rebuilds the table and
runs the offline report (evaluation/report.py) against any surviving
checkpoint, without retraining:

    # session-split val report (same protocol as the trainer's)
    python tools/report_resident.py --checkpoint runs/r3g/ckpt --frames 200000 \
        --seed 0 --split val --out runs/r3g/evaluation_report.json

    # fresh-holdout report (seed no training collection used)
    python tools/report_resident.py --checkpoint runs/r3g/ckpt --frames 33000 \
        --seed 777777 --split all --out runs/r3g/evaluation_report_fresh.json

Reference parity: mirrors the reference's evaluate_model.py (val split of the
collected dataset -> per-channel MAE/corr JSON) for checkpoints whose data
never touched disk.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    from cilrs_tpu.cli.common import build_map, enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()

    p = argparse.ArgumentParser(description="resident-checkpoint offline report")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--frames", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--vehicles", type=int, default=12)
    p.add_argument("--walkers", type=int, default=6)
    p.add_argument("--map", default="town01")
    p.add_argument("--split", choices=["val", "all"], default="val",
                   help="'val': the trainer's stratified val split of the "
                        "collection; 'all': every collected frame (holdout)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.dataset import stratified_split
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.evaluation.report import (
        collect_predictions_resident, offline_report, save_report)
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.state import create_train_state

    cfg = load_train_config()
    net = build_map(args.map)

    print(f"=== re-collect {args.frames} frames (seed {args.seed}) ===")
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=args.vehicles,
        num_pedestrians=args.walkers, weather_idx=None, seed=args.seed)
    print(f"  {args.frames} frames at {stats['frames_per_sec']:.0f}/s")

    if args.split == "val":
        ds = labels_dataset(labels)
        _, rows = stratified_split(ds, cfg.training.val_fraction,
                                   cfg.training.seed)
    else:
        rows = np.arange(args.frames)
    print(f"  evaluating {len(rows)} rows")

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_best_params(args.checkpoint, state)
    pred, true, cmd = collect_predictions_resident(
        state, dict(table, image_shape=table["image_shape"]), labels,
        np.asarray(rows), cfg.training.batch_size, cfg)
    report = offline_report(pred, true, cmd, weather=labels["env"][rows] % 5)
    save_report(report, args.out)
    print(json.dumps({k: report[k] for k in ("num_samples", "steer", "brake",
                                             "speed")}, indent=2))
    print(f"full report -> {args.out}")
    return report


if __name__ == "__main__":
    main()
