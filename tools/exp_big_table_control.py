"""The controlled arm that isolates the big-table OBJECT from the batch stream.

tools/exp_dispatch_divergence.py proved one 25-step train dispatch is
bit-identical between a 150k and a 200k resident table (same global indices,
same init). tools/exp_checksum.py proved the tables' bytes are bit-identical
on the shared prefix. Yet full trainings collapse 5/5 on 200k collections and
are healthy on every 150k one.

This arm: collect the 200k table, but hand train() a labels dataset TRUNCATED
to the first 150k rows. Because a 150k collection is a bit-identical prefix of
the 200k one, the stratified split, the weighted sampler stream, the steps per
epoch, the init, and every gathered train row are then IDENTICAL to the
healthy r4g run (runs/r4g, best val 0.0422005...). The ONLY remaining
difference is the resident table argument: 210,800 rows (11.2 GB) instead of
157,800 (8.4 GB).

  val == r4g's 0.0422 (ideally bit-equal) -> the big table object is innocent;
      the collapse rides the 200k SPLIT/sampler membership (statistics of
      which rows train) — investigate the split;
  collapse -> the table size is causal in the full training program even
      though a single instrumented dispatch is bit-faithful (fusion/layout
      Heisenbug at scale) — escalate to HLO diffing.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

# Diagnostic tools deliberately build >2^33-byte tables (quarantined for
# production runs by data/resident.py).
os.environ.setdefault("CILRS_TPU_ALLOW_BIG_TABLE", "1")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/r4h")
    p.add_argument("--frames", type=int, default=200_000)
    p.add_argument("--truncate", type=int, default=150_000)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache()
    require_accelerator()

    import jax

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.evaluation.report import (collect_predictions_resident,
                                             offline_report, save_report)
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.loop import train
    from cilrs_tpu.train.state import create_train_state

    os.makedirs(args.workdir, exist_ok=True)
    net = build_map("town01")

    print(f"=== collect {args.frames} (train sees first {args.truncate}) ===",
          flush=True)
    table, labels, _ = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=12,
        num_pedestrians=6, weather_idx=None, seed=args.seed)
    labels_t = {k: v[:args.truncate] for k, v in labels.items()}

    cfg = load_train_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, epochs=args.epochs))
    ds = labels_dataset(labels_t)

    t0 = time.time()
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    out = train(ds, cfg, ckpt_dir=ckpt_dir, resident=table)
    print(f"best val {out['best_val_loss']:.7f} in {time.time() - t0:.0f}s "
          f"(r4g reference: 0.0422005)", flush=True)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_best_params(ckpt_dir, state)

    table = out = None  # free the big table before the fresh collect
    ftable, flabels, _ = collect_resident(
        net, 33_000, num_envs=args.envs, num_vehicles=12,
        num_pedestrians=6, weather_idx=None, seed=args.seed + 777_777)
    pred, true, cmdv = collect_predictions_resident(
        state, ftable, flabels, np.arange(33_000),
        cfg.training.batch_size, cfg)
    rep = offline_report(pred, true, cmdv, weather=flabels["env"] % 5)
    save_report(rep, os.path.join(args.workdir, "evaluation_report_fresh.json"))
    print(f"fresh: steer MAE {rep['steer']['mae']:.4f} "
          f"within0.01 {rep['steer_accuracy']['within_0.01']:.3f} "
          f"(r4g fresh: 0.0065)")
    for c, v in rep["per_command"].items():
        print(f"  {c:>10}: steer MAE {v['steer_mae']:.4f} ({v['samples']})")


if __name__ == "__main__":
    main()
