"""The fused pipeline: fleet collection -> training -> closed-loop benchmark.

The reference spreads this over days of manual work (collect_data.py sessions,
prepare_dataset.py, a Kaggle notebook, autonomous_drive.py runs); here it is one
command on one machine (BASELINE.json config 5):

    python -m cilrs_tpu.cli.pipeline --workdir runs/full --frames 150000 \
        --epochs 15 --bench-duration 300
"""

from __future__ import annotations

import argparse
import json
import os
import time

from cilrs_tpu.cli.common import build_map
from cilrs_tpu.config import WEATHER_NAMES, load_train_config, weather_index


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU collect->train->eval pipeline")
    p.add_argument("--workdir", required=True)
    p.add_argument("--frames", type=int, default=150_000, help="total across weathers")
    p.add_argument("--collect-weathers", nargs="*", default=["clear", "rain", "fog", "night", "hardrain"])
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--vehicles", type=int, default=12)
    p.add_argument("--walkers", type=int, default=6)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--map", default="town01")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-collect", action="store_true")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--skip-bench", action="store_true")
    p.add_argument("--bench-duration", type=float, default=300.0)
    p.add_argument("--resident", action="store_true",
                   help="collect straight into the HBM table and train from it "
                        "(no frame bytes ever cross the device->host tunnel)")
    p.add_argument("--hard-boost", type=float, default=None,
                   help="extra sampling weight on big-steer/braking frames "
                        "(TrainingConfig.hard_frame_boost; 0 = reference parity)")
    p.add_argument("--speed-boost", type=float, default=None,
                   help="train-only multiplier on the aux speed-head loss "
                        "weight (TrainingConfig.speed_loss_boost; reported "
                        "val loss keeps the canonical weights)")
    p.add_argument("--brake-boost", type=float, default=None,
                   help="train-only multiplier on the brake-head L1 weight "
                        "(TrainingConfig.brake_loss_boost; reported val loss "
                        "keeps the canonical weights)")
    p.add_argument("--refresh-every", type=int, default=0,
                   help="resident mode: re-collect the train table every N "
                        "epochs (fresh frames, fixed val snapshot) — the "
                        "on-device simulator makes data effectively free")
    p.add_argument("--stage1-frames", type=int, default=0,
                   help="latch-then-widen curriculum: first train a full "
                        "run on this many frames (the proven-latching 150k "
                        "stream), then widen to --frames initialized from "
                        "its best slot")
    p.add_argument("--stage1-epochs", type=int, default=24)
    p.add_argument("--latch-probes", type=int, default=0,
                   help="stage-1 robustness: probe up to N training streams "
                        "for 2 epochs each and train stage 1 with the first "
                        "whose turn errors latch (LEFT+RIGHT val err < "
                        "0.11) — removes the dependence on any one lucky "
                        "stream seed (RESULTS_training.md round 6)")
    p.add_argument("--init-from", default=None,
                   help="warm-start params from another run's best checkpoint "
                        "(stage-2 fixed-table fine-tune after a refresh run)")
    p.add_argument("--lr", type=float, default=None,
                   help="peak learning-rate override (fine-tunes want ~0.3x)")
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience override (refresh runs want it "
                        "high: the leak-free val plateaus long before the "
                        "cosine tail delivers its steer-precision gains)")
    p.add_argument("--report-frames", type=int, default=0,
                   help="resident mode: also run the offline report on this "
                        "many FRESHLY collected held-out frames (never seen "
                        "by training or the split) -> evaluation_report_fresh.json")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()
    timing = {}

    net = build_map(args.map)

    if args.resident:
        return _resident_pipeline(net, args, t_start, timing)

    session_dirs = [
        os.path.join(args.workdir, f"session_{w}") for w in args.collect_weathers
    ]

    # ---- 1. collect ----
    if not args.skip_collect:
        from cilrs_tpu.data.collect import collect_session

        per = args.frames // len(args.collect_weathers)
        t0 = time.time()
        for w, out in zip(args.collect_weathers, session_dirs):
            print(f"\n=== collect {per} frames, weather={w} ===")
            stats = collect_session(
                net, out, num_frames=per, num_envs=args.envs,
                num_vehicles=args.vehicles, num_pedestrians=args.walkers,
                weather_idx=weather_index(w), seed=args.seed + weather_index(w),
            )
            print(f"  {stats['frames']} frames at {stats['frames_per_sec']:.0f}/s")
        timing["collect_s"] = time.time() - t0

    # ---- 2. train ----
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    if not args.skip_train:
        import dataclasses

        from cilrs_tpu.data.dataset import load_sessions
        from cilrs_tpu.train.loop import train

        t0 = time.time()
        cfg = load_train_config()
        tcfg = cfg.training
        if args.epochs is not None:
            tcfg = dataclasses.replace(tcfg, epochs=args.epochs)
        if args.batch_size is not None:
            tcfg = dataclasses.replace(tcfg, batch_size=args.batch_size)
        if args.patience is not None:
            tcfg = dataclasses.replace(tcfg, early_stop_patience=args.patience)
        ocfg = cfg.optimizer
        if args.lr is not None:
            ocfg = dataclasses.replace(ocfg, learning_rate=args.lr)
        cfg = dataclasses.replace(cfg, training=tcfg, optimizer=ocfg)
        print("\n=== load dataset ===")
        ds = load_sessions([d for d in session_dirs if os.path.isdir(d)])
        print(f"  {len(ds)} frames")
        print("\n=== train ===")
        out = train(ds, cfg, ckpt_dir=ckpt_dir, init_from=args.init_from)
        timing["train_s"] = time.time() - t0
        timing["best_val_loss"] = out["best_val_loss"]
        print(f"best val loss: {out['best_val_loss']:.4f} in {timing['train_s']:.0f}s")

    # ---- 3. benchmark ----
    if not args.skip_bench:
        from cilrs_tpu.cli import benchmark as bench_cli

        t0 = time.time()
        print("\n=== closed-loop 5-weather benchmark ===")
        results = bench_cli.main([
            "--checkpoint", ckpt_dir,
            "--duration", str(args.bench_duration),
            "--map", args.map, "--seed", str(args.seed),
            "--out", os.path.join(args.workdir, "RESULTS.md"),
            "--json-out", os.path.join(args.workdir, "benchmark.json"),
        ])
        timing["bench_s"] = time.time() - t0

    timing["total_s"] = time.time() - t_start
    with open(os.path.join(args.workdir, "pipeline_timing.json"), "w") as f:
        json.dump(timing, f, indent=2)
    print(f"\npipeline done in {timing['total_s']:.0f}s: {timing}")
    return timing


def _resident_pipeline(net, args, t_start, timing):
    """collect -> HBM table -> train -> offline report -> benchmark, one
    process, zero frame-byte tunnel traffic (data/resident.py)."""
    import dataclasses
    import json as _json

    import jax
    import numpy as np

    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.evaluation.report import (
        collect_predictions_resident, offline_report, save_report)
    from cilrs_tpu.train.loop import train

    cfg = load_train_config()
    tcfg = cfg.training
    if args.epochs is not None:
        tcfg = dataclasses.replace(tcfg, epochs=args.epochs)
    if args.batch_size is not None:
        tcfg = dataclasses.replace(tcfg, batch_size=args.batch_size)
    if args.hard_boost is not None:
        tcfg = dataclasses.replace(tcfg, hard_frame_boost=args.hard_boost)
    if args.speed_boost is not None:
        tcfg = dataclasses.replace(tcfg, speed_loss_boost=args.speed_boost)
    if args.brake_boost is not None:
        tcfg = dataclasses.replace(tcfg, brake_loss_boost=args.brake_boost)
    if args.patience is not None:
        tcfg = dataclasses.replace(tcfg, early_stop_patience=args.patience)
    ocfg = cfg.optimizer
    if args.lr is not None:
        ocfg = dataclasses.replace(ocfg, learning_rate=args.lr)
    cfg = dataclasses.replace(cfg, training=tcfg, optimizer=ocfg)

    init_from = args.init_from
    if args.stage1_frames and not args.skip_train:
        # Latch-then-widen curriculum (RESULTS_training.md round 6): turn-
        # feature latching from a from-scratch trunk is bistable, and the
        # 150k seed-42 stream is the reproducibly-latching draw (seeds
        # 43/137 collapse even at 150k; every from-scratch 176k stream
        # tested collapses). Stage 1 trains that proven stream; stage 2
        # widens the latched model to the full --frames split, which holds
        # the latch and reaches reference-bar val (runs/stage2.json:
        # val 0.0475 < 0.054 in 6 epochs). The reference avoids the latch
        # problem entirely with its ImageNet-pretrained trunk (PARITY
        # delta 4) — unavailable offline here, so the curriculum is the
        # TPU-native equivalent.
        print(f"\n=== stage 1: latch on {args.stage1_frames} frames ===")
        t0 = time.time()
        s1_table, s1_labels, _ = collect_resident(
            net, args.stage1_frames, num_envs=args.envs,
            num_vehicles=args.vehicles, num_pedestrians=args.walkers,
            weather_idx=None, seed=args.seed)
        # Stage 1 always runs the CANONICAL latch recipe: the head boosts
        # (--brake-boost/--speed-boost/--hard-boost) are stage-2 tuning and
        # changing the stage-1 gradient mix would reshuffle the bistable
        # latch draw the curriculum depends on.
        s1_cfg = dataclasses.replace(cfg, training=dataclasses.replace(
            cfg.training, epochs=args.stage1_epochs,
            speed_loss_boost=1.0, brake_loss_boost=1.0, hard_frame_boost=0.0))
        s1_ckpt = os.path.join(args.workdir, "ckpt_stage1")
        s1_seed = None  # default stream (cfg.training.seed)
        if args.latch_probes:
            # 2-epoch probes over candidate streams: latching is decided in
            # the first epochs (healthy ~0.066 LEFT+RIGHT vs collapsed
            # ~0.12-0.19), and a probe costs ~30 s vs a wasted full run.
            probe_cfg = dataclasses.replace(s1_cfg, training=dataclasses.replace(
                s1_cfg.training, epochs=2))
            for k in range(args.latch_probes):
                cand = (cfg.training.seed if k == 0
                        else cfg.training.seed + 101 * k)
                pres = train(labels_dataset(s1_labels), probe_cfg,
                             resident=dict(s1_table), verbose=False,
                             stream_seed=cand, init_from=init_from)
                h = pres["history"][-1]
                del pres  # free the probe's train state before the next one
                turn = h["steer_err_LEFT"] + h["steer_err_RIGHT"]
                latched = turn < 0.11
                print(f"  latch probe {k}: stream seed {cand} "
                      f"LEFT+RIGHT {turn:.3f} -> "
                      f"{'LATCHED' if latched else 'no latch'}", flush=True)
                if latched:
                    s1_seed = cand
                    break
            else:
                print("  no probe latched; proceeding with the last stream")
                s1_seed = cand
        s1_out = train(labels_dataset(s1_labels), s1_cfg, ckpt_dir=s1_ckpt,
                       resident=s1_table, init_from=init_from,
                       stream_seed=s1_seed)
        del s1_table, s1_out  # free ~8 GB of HBM before the main collect
        timing["stage1_s"] = time.time() - t0
        init_from = s1_ckpt
        print(f"stage 1 done in {timing['stage1_s']:.0f}s -> {s1_ckpt}")

    print(f"\n=== resident collect: {args.frames} frames (mixed weathers) ===")
    t0 = time.time()
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=args.vehicles,
        num_pedestrians=args.walkers, weather_idx=None, seed=args.seed,
        output_dir=os.path.join(args.workdir, "session_resident"),
    )
    timing["collect_s"] = time.time() - t0
    timing["collect_frames_per_sec"] = stats["frames_per_sec"]

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    report = None
    if not args.skip_train:
        print("\n=== train (resident table) ===")
        t0 = time.time()
        ds = labels_dataset(labels)

        def refresh_fn(i):
            t, lab, _ = collect_resident(
                net, args.frames, num_envs=args.envs,
                num_vehicles=args.vehicles, num_pedestrians=args.walkers,
                weather_idx=None, seed=args.seed + 1009 * i)
            return t, labels_dataset(lab)

        # Hand the table over WITHOUT keeping a local reference: with
        # --refresh-every the trainer frees it before each re-collect, and a
        # ref held here would pin 8 GB of HBM through that collect (OOM).
        holder = [table]
        del table
        out = train(ds, cfg, ckpt_dir=ckpt_dir, resident=holder.pop(),
                    refresh_fn=refresh_fn if args.refresh_every else None,
                    refresh_every=args.refresh_every,
                    init_from=init_from)
        timing["train_s"] = time.time() - t0
        timing["best_val_loss"] = out["best_val_loss"]
        print(f"best val loss: {out['best_val_loss']:.4f} "
              f"in {timing['train_s']:.0f}s")

        print("\n=== offline report (resident val split) ===")
        from cilrs_tpu.data.dataset import stratified_split
        from cilrs_tpu.train.checkpoint import restore_best_params
        from cilrs_tpu.train.state import create_train_state

        t0 = time.time()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        state = restore_best_params(ckpt_dir, state)
        _, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                      cfg.training.seed)
        # The report reads the trainer's val SNAPSHOT (local rows 0..V-1):
        # the collection table itself may have been swapped away by refresh.
        val_table = out["val_table"]
        if args.refresh_every:
            # Refresh runs: val_table is an independent snapshot — local rows,
            # subset labels (the collection table was swapped away).
            val_labels = {k: labels[k][val_idx]
                          for k in ("controls", "speed", "command")}
        else:
            # Fixed table: val_table IS the collection table and val_rows are
            # global row ids, so labels index globally too.
            val_labels = {k: labels[k] for k in ("controls", "speed", "command")}
        pred, true, cmd = collect_predictions_resident(
            state, val_table, val_labels, out["val_rows"],
            cfg.training.batch_size, cfg)
        # Mixed-weather collects assign weather round-robin by env id
        # (data/resident.make_fleet): env % 5 recovers the per-frame weather.
        report = offline_report(pred, true, cmd,
                                weather=labels["env"][val_idx] % 5)
        save_report(report, os.path.join(args.workdir, "evaluation_report.json"))
        timing["report_s"] = time.time() - t0
        print(f"  steer MAE {report['steer']['mae']:.4f} "
              f"corr {report['steer']['correlation']:.4f} "
              f"({report['num_samples']} val samples)")
        out = val_table = None  # free val snapshot + train state refs

        if args.report_frames:
            # Fresh-holdout report: frames from a seed no training collection
            # used — a strictly harder protocol than a split of the training
            # sessions (generalization to unseen scenarios, not unseen rows).
            print(f"\n=== offline report ({args.report_frames} fresh frames) ===")
            t0 = time.time()
            ftable, flabels, _ = collect_resident(
                net, args.report_frames, num_envs=args.envs,
                num_vehicles=args.vehicles, num_pedestrians=args.walkers,
                weather_idx=None, seed=args.seed + 777_777)
            pred, true, cmd = collect_predictions_resident(
                state, ftable, flabels, np.arange(args.report_frames),
                cfg.training.batch_size, cfg)
            fresh = offline_report(pred, true, cmd,
                                   weather=flabels["env"] % 5)
            save_report(fresh, os.path.join(args.workdir,
                                            "evaluation_report_fresh.json"))
            timing["report_fresh_s"] = time.time() - t0
            print(f"  fresh steer MAE {fresh['steer']['mae']:.4f} "
                  f"corr {fresh['steer']['correlation']:.4f} "
                  f"({fresh['num_samples']} samples)")
            del ftable
        state = None
    else:
        del table  # free ~10 GB of HBM before the closed-loop fleet compiles
    if not args.skip_bench:
        from cilrs_tpu.cli import benchmark as bench_cli

        t0 = time.time()
        print("\n=== closed-loop 5-weather benchmark ===")
        bench_cli.main([
            "--checkpoint", ckpt_dir,
            "--duration", str(args.bench_duration),
            "--map", args.map, "--seed", str(args.seed),
            "--out", os.path.join(args.workdir, "RESULTS.md"),
            "--json-out", os.path.join(args.workdir, "benchmark.json"),
        ])
        timing["bench_s"] = time.time() - t0

    timing["total_s"] = time.time() - t_start
    with open(os.path.join(args.workdir, "pipeline_timing.json"), "w") as f:
        _json.dump(timing, f, indent=2)
    print(f"\npipeline done in {timing['total_s']:.0f}s: {timing}")
    return timing


if __name__ == "__main__":
    main()
