"""Bisect the 200k-frame training collapse (VERDICT r2, next-round item 1).

Three 200k-frame runs (r3g, r3l, r3n) collapsed on LEFT/RIGHT steering where
every 150k run is healthy. The resident-table WRITE path is proven bit-exact
at 10.69 GB (donated dynamic_update_slice sweep; see RESULTS_training.md), so
the remaining hypotheses split cleanly:

  (a) data content — frames from LATE sim time (each env runs ~12.5k ticks at
      200k vs ~9.4k at 150k) carry degraded teacher turn labels (e.g. NPC
      jams building up at junctions -> creeping, interrupted turns);
  (b) training-side size effect — something about the bigger table/split
      (sampler, schedule, gather group) breaks past 150k.

Design: ONE 200k collection (seed-identical to r3n's), then two trainings on
the SAME table with IDENTICAL val rows:
  arm S: r3m recipe on a random 150k-equivalent train subset (max_train_frames)
  arm F: r3m recipe on the full train split (reproduces r3n)

arm S sick  -> (a): the collection itself is poisoned (late-tick labels).
arm S healthy + arm F sick -> (b): a training-side scaling bug.

Plus a host-side label analysis by tick band that tests (a) directly from
the labels, before any training finishes.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Diagnostic tools deliberately build >2^33-byte tables (quarantined for
# production runs by data/resident.py).
os.environ.setdefault("CILRS_TPU_ALLOW_BIG_TABLE", "1")


def label_analysis(labels: dict, band: int = 1000) -> dict:
    """Per-tick-band teacher-label stats, focused on turn quality."""
    tick = labels["tick"]
    cmd = labels["command"]
    steer = labels["controls"][:, 0]
    speed = labels["speed_kmh"]
    obst = labels["obstacle_dist"]
    turn = (cmd == 1) | (cmd == 2)
    bands = []
    for lo in range(0, int(tick.max()) + 1, band):
        m = (tick >= lo) & (tick < lo + band)
        mt = m & turn
        n, nt = int(m.sum()), int(mt.sum())
        if n == 0:
            continue
        row = {
            "tick_lo": lo,
            "frames": n,
            "turn_frames": nt,
            "turn_frac": round(nt / n, 4),
            "mean_speed_kmh": round(float(speed[m].mean()), 2),
            "obst_lt12_frac": round(float((obst[m] < 12.0).mean()), 4),
        }
        if nt:
            a = np.abs(steer[mt])
            row.update({
                "turn_abs_steer_mean": round(float(a.mean()), 4),
                "turn_abs_steer_p50": round(float(np.median(a)), 4),
                "turn_flat_frac": round(float((a < 0.05).mean()), 4),
                "turn_obst_lt12_frac": round(float((obst[mt] < 12.0).mean()), 4),
                "turn_mean_speed_kmh": round(float(speed[mt].mean()), 2),
            })
        bands.append(row)
    return {"band": band, "bands": bands}


def print_bands(analysis: dict):
    cols = ("tick_lo", "frames", "turn_frac", "turn_abs_steer_mean",
            "turn_abs_steer_p50", "turn_flat_frac", "turn_obst_lt12_frac",
            "turn_mean_speed_kmh", "mean_speed_kmh")
    print("  " + "  ".join(f"{c:>20}" for c in cols))
    for row in analysis["bands"]:
        print("  " + "  ".join(f"{row.get(c, ''):>20}" for c in cols))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/r4a")
    p.add_argument("--frames", type=int, default=200_000)
    p.add_argument("--subset", type=int, default=127_500,
                   help="arm-S train-split cap (= 0.85 * 150k, the r3m size)")
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--vehicles", type=int, default=12)
    p.add_argument("--walkers", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--arms", nargs="*", default=["subset", "full"])
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache()
    require_accelerator()

    import dataclasses

    import jax

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.dataset import stratified_split
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.evaluation.report import (collect_predictions_resident,
                                             offline_report, save_report)
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.loop import train
    from cilrs_tpu.train.state import create_train_state

    os.makedirs(args.workdir, exist_ok=True)
    net = build_map("town01")

    print(f"=== collect {args.frames} frames (seed {args.seed}) ===", flush=True)
    t0 = time.time()
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=args.vehicles,
        num_pedestrians=args.walkers, weather_idx=None, seed=args.seed,
        output_dir=os.path.join(args.workdir, "session_resident"))
    print(f"collect: {time.time()-t0:.0f}s", flush=True)

    print("\n=== label analysis by tick band ===", flush=True)
    analysis = label_analysis(labels)
    print_bands(analysis)
    with open(os.path.join(args.workdir, "label_analysis.json"), "w") as f:
        json.dump(analysis, f, indent=2)
    # Keep raw labels for deeper host-side digging without a re-collect.
    np.savez_compressed(os.path.join(args.workdir, "labels.npz"), **labels)
    if args.skip_train:
        return

    cfg = load_train_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, epochs=args.epochs))
    ds = labels_dataset(labels)
    _, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                  cfg.training.seed)
    val_labels = {k: labels[k] for k in ("controls", "speed", "command")}

    for name in args.arms:
        cap = args.subset if name == "subset" else None
        print(f"\n=== train arm {name} (cap={cap}) ===", flush=True)
        t0 = time.time()
        ckpt_dir = os.path.join(args.workdir, f"ckpt_{name}")
        out = train(ds, cfg, ckpt_dir=ckpt_dir, resident=table,
                    max_train_frames=cap)
        print(f"arm {name}: best val {out['best_val_loss']:.4f} "
              f"in {time.time()-t0:.0f}s", flush=True)

        state = create_train_state(cfg, jax.random.PRNGKey(0))
        state = restore_best_params(ckpt_dir, state)
        pred, true, cmdv = collect_predictions_resident(
            state, out["val_table"], val_labels, out["val_rows"],
            cfg.training.batch_size, cfg)
        rep = offline_report(pred, true, cmdv,
                             weather=labels["env"][val_idx] % 5)
        save_report(rep, os.path.join(args.workdir,
                                      f"evaluation_report_{name}.json"))
        print(f"arm {name}: steer MAE {rep['steer']['mae']:.4f} "
              f"within0.01 {rep['steer_accuracy']['within_0.01']:.3f}")
        for c, v in rep["per_command"].items():
            print(f"    {c:>10}: steer MAE {v['steer_mae']:.4f} "
                  f"({v['samples']})")
        out = state = None


if __name__ == "__main__":
    main()
