"""Round-4 follow-up on the 200k collapse: is the TAIL of a long collection
poisoned, or does training itself break past 150k?

History: r3g/r3l/r3n (200k, lamps on) collapsed; the r4a bisect ruled out
train-table SIZE (a 127.5k random subset of a 200k collection collapses too)
and blamed the brake-lamp cue — but r4a ran lamps-ON, so collection length was
never isolated. r4e (200k collection, lamps OFF, exact r4b recipe) collapsed
identically (val 0.211, LEFT 0.061 / RIGHT 0.078 vs r4b's 0.0056/0.0053),
falsifying "lamps explain the 200k collapse". Lamps are a real, separately
measured shortcut (r4d vs r4b: 2.4x LEFT damage at 150k) — but the 200k
collapse is something else, and it rides the COLLECTION, not the train size.

Remaining hypotheses:
  (a) tail poison — frames collected past tick ~9.4k (the 150k-frame point
      at 16 envs) are bad: either the images are degraded/misaligned or the
      labels stop matching the scene (band-aggregate label stats are flat,
      runs/r4a/label_analysis.json, so simple label drift is already out);
  (b) training-side scaling — something about training against the bigger
      resident table breaks even when every TRAIN row comes from the healthy
      prefix region.

Design: ONE 200k collection (seed 0, 16 envs — frame-identical prefix to the
healthy r4b 150k collection), then:
  1. image probes, zero training: per-tick-band pixel stats + a contact sheet
     of mid-turn frames early (tick<3k) vs late (tick>11k) — direct evidence
     on image degradation/misalignment;
  2. arm "prefix": the exact r4b recipe trained ONLY on rows < 150k (via
     train()'s train_row_mask; ~127.5k rows = r4b's train size) against the
     FULL 200k resident table;
  3. offline reports split by val region: rows < 150k vs rows >= 150k.

Readout:
  prefix healthy on early-val, bad on tail-val   -> (a) tail frames poisoned
  prefix healthy on both                         -> (a) but subtler: tail rows
                                                    are individually learnable
                                                    yet poison training when
                                                    sampled (label conflict)
  prefix collapsed                               -> (b) training-side bug
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


def pixel_band_stats(table, labels, bands=(0, 3000, 6000, 9000, 12000, 15000),
                     width=500, n=256):
    """Per-tick-band mean/std of raw frame bytes (detects render degradation)."""
    import jax
    import jax.numpy as jnp

    from cilrs_tpu.ops.gather import gather_rows

    H, W, C = table["image_shape"]
    D = H * W * C
    tick = labels["tick"]
    out = []
    for lo in bands:
        rows = np.where((tick >= lo) & (tick < lo + width))[0][:n]
        if len(rows) == 0:
            continue
        px = np.asarray(jax.device_get(
            gather_rows(table["images"], jnp.asarray(rows))[:, :D]))
        out.append({"tick_lo": int(lo), "rows": len(rows),
                    "mean": round(float(px.mean()), 3),
                    "std": round(float(px.std()), 3),
                    "p01": int(np.percentile(px, 1)),
                    "p99": int(np.percentile(px, 99))})
    return out


def turn_contact_sheet(table, labels, path, per_side=8):
    """Mid-turn frames early vs late, annotated with their labels. If late
    frames don't LOOK like mid-turn scenes, images and labels are misaligned
    (or the render degrades) past the 150k point."""
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from cilrs_tpu.ops.gather import gather_rows

    H, W, C = table["image_shape"]
    D = H * W * C
    tick = labels["tick"]
    steer = labels["controls"][:, 0]
    cmd = labels["command"]
    turn = ((cmd == 1) | (cmd == 2)) & (np.abs(steer) > 0.15)
    early = np.where(turn & (tick < 3000))[0]
    late = np.where(turn & (tick > 11000))[0]
    rng = np.random.RandomState(0)
    early = rng.choice(early, min(per_side, len(early)), replace=False)
    late = rng.choice(late, min(per_side, len(late)), replace=False)
    rows = np.concatenate([early, late])
    px = np.asarray(jax.device_get(
        gather_rows(table["images"], jnp.asarray(rows))[:, :D]))
    px = px.reshape(-1, H, W, C)
    fig, axes = plt.subplots(2, per_side, figsize=(3 * per_side, 7))
    for i, r in enumerate(rows):
        ax = axes[i // per_side][i % per_side]
        ax.imshow(px[i])
        ax.set_title(f"row {r} tick {tick[r]} env {labels['env'][r]}\n"
                     f"{'LEFT' if cmd[r] == 1 else 'RIGHT'} "
                     f"steer {steer[r]:+.2f} v {labels['speed_kmh'][r]:.0f}",
                     fontsize=7)
        ax.axis("off")
    axes[0][0].set_ylabel("early")
    fig.suptitle("mid-turn frames: early ticks (top) vs late ticks (bottom)")
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/r4f")
    p.add_argument("--frames", type=int, default=200_000)
    p.add_argument("--prefix-frames", type=int, default=150_000)
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache()
    require_accelerator()

    import dataclasses

    import jax

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.dataset import stratified_split
    from cilrs_tpu.data.resident import (
        collect_resident, labels_dataset, unwrap_monolithic)
    from cilrs_tpu.evaluation.report import (collect_predictions_resident,
                                             offline_report, save_report)
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.loop import train
    from cilrs_tpu.train.state import create_train_state

    os.makedirs(args.workdir, exist_ok=True)
    net = build_map("town01")

    print(f"=== collect {args.frames} frames (seed {args.seed}) ===", flush=True)
    t0 = time.time()
    table, labels, _ = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=12,
        num_pedestrians=6, weather_idx=None, seed=args.seed)
    print(f"collect: {time.time() - t0:.0f}s", flush=True)

    print("\n=== image probes (zero training) ===", flush=True)
    stats = pixel_band_stats(unwrap_monolithic(table), labels)
    for row in stats:
        print(f"  {row}", flush=True)
    with open(os.path.join(args.workdir, "pixel_band_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    sheet = os.path.join(args.workdir, "turn_frames_early_vs_late.png")
    turn_contact_sheet(unwrap_monolithic(table), labels, sheet)
    print(f"  contact sheet -> {sheet}", flush=True)
    if args.skip_train:
        return

    cfg = load_train_config()
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, epochs=args.epochs))
    ds = labels_dataset(labels)
    _, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                  cfg.training.seed)
    val_labels = {k: labels[k] for k in ("controls", "speed", "command")}
    mask = np.arange(len(ds)) < args.prefix_frames

    print(f"\n=== train arm prefix (rows < {args.prefix_frames}) ===", flush=True)
    t0 = time.time()
    ckpt_dir = os.path.join(args.workdir, "ckpt_prefix")
    out = train(ds, cfg, ckpt_dir=ckpt_dir, resident=table,
                train_row_mask=mask)
    print(f"prefix: best val {out['best_val_loss']:.4f} "
          f"in {time.time() - t0:.0f}s", flush=True)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_best_params(ckpt_dir, state)
    for region, vsel in (("early", val_idx[val_idx < args.prefix_frames]),
                         ("tail", val_idx[val_idx >= args.prefix_frames])):
        pred, true, cmdv = collect_predictions_resident(
            state, out["val_table"], val_labels, np.asarray(vsel),
            cfg.training.batch_size, cfg)
        rep = offline_report(pred, true, cmdv,
                             weather=labels["env"][vsel] % 5)
        save_report(rep, os.path.join(args.workdir,
                                      f"evaluation_report_{region}.json"))
        print(f"  val[{region}] ({len(vsel)} rows): "
              f"steer MAE {rep['steer']['mae']:.4f} "
              f"within0.01 {rep['steer_accuracy']['within_0.01']:.3f}")
        for c, v in rep["per_command"].items():
            print(f"    {c:>10}: steer MAE {v['steer_mae']:.4f} "
                  f"({v['samples']})")

    # Fresh holdout: a small (33k-row, 1.8 GB) table no training touched —
    # the trusted oracle. If the prefix arm scores r4b-level HERE while its
    # training-time val curves looked collapsed, the curves were polluted by
    # unpredictable tail VAL rows and the prefix model is actually healthy.
    table = out = None  # free the 11 GB table (out["val_table"] aliases it)
    ftable, flabels, _ = collect_resident(
        net, 33_000, num_envs=args.envs, num_vehicles=12,
        num_pedestrians=6, weather_idx=None, seed=args.seed + 777_777)
    pred, true, cmdv = collect_predictions_resident(
        state, ftable, flabels, np.arange(33_000),
        cfg.training.batch_size, cfg)
    rep = offline_report(pred, true, cmdv, weather=flabels["env"] % 5)
    save_report(rep, os.path.join(args.workdir,
                                  "evaluation_report_fresh.json"))
    print(f"  fresh (33000 rows): steer MAE {rep['steer']['mae']:.4f} "
          f"within0.01 {rep['steer_accuracy']['within_0.01']:.3f}")
    for c, v in rep["per_command"].items():
        print(f"    {c:>10}: steer MAE {v['steer_mae']:.4f} "
              f"({v['samples']})")


if __name__ == "__main__":
    main()
