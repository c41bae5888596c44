"""Cross-evaluate the HEALTHY r5e checkpoint on a fresh same-seed 176k paged
collection, per row region — the training-free discriminator for the >150k
collapse (VERDICT r4 item 1).

The 176k collection (seed 0, envs 16) shares its early rows bit-identically
with the 150k collection r5e trained on; rows past ~150k are new ticks the
r5e model never saw (fresh-holdout-like). Scoring the proven-good model on
EVERY row of the big table answers, with no training confound:

  - late-row turn errors ~ fresh-holdout level (LEFT ~0.02)  -> content AND
    paged reads are clean at scale; the collapse lives in the TRAINING loop.
  - late-row turn errors ~ collapse level (LEFT ~0.07+)      -> the rows the
    176k run adds are unlearnable/misread; content or read path, localized.

Usage: PYTHONPATH=/root/repo python tools/exp_cross_eval.py \
           [--frames 176256] [--ckpt runs/r5e/ckpt]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--ckpt", default="runs/r5e/ckpt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/cross_eval.json")
    p.add_argument("--save-preds", default=None,
                   help="npz path for per-row (pred_controls, true_controls, "
                        "command, speed_kmh) — failure-mode diagnosis")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache(); require_accelerator()

    import jax
    import jax.numpy as jnp

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident
    from cilrs_tpu.ops.gather import gather_rows_paged
    from cilrs_tpu.ops.image import normalize
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.state import create_train_state

    net = build_map("town01")
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    print(f"  collected {args.frames} frames, pages={stats['num_pages']} "
          f"page_rows={stats['page_rows']}")

    cfg = load_train_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_best_params(args.ckpt, state)

    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    page_rows = int(table["page_rows"])
    pages = table["images"]

    B, K = 120, 50

    @functools.partial(jax.jit, static_argnames=())
    def eval_group(params, batch_stats, pages, speed, command, idxs):
        # idxs [K, B] global rows -> per-row (pred_steer, pred_throttle,
        # pred_brake) via the SAME paged gather the training loop uses.
        flat = idxs.reshape(-1)
        imgs = gather_rows_paged(pages, flat, page_rows)[:, :D].reshape(
            (flat.shape[0],) + img_shape)
        x = normalize(imgs.astype(jnp.float32) / 255.0)
        sp = speed[flat]
        cm = command[flat]

        def body(carry, xb):
            xi, si, ci = xb
            controls, _ = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                xi, si, ci, train=False)
            return carry, controls

        xs = (x.reshape(idxs.shape + x.shape[1:]),
              sp.reshape(idxs.shape), cm.reshape(idxs.shape))
        _, out = jax.lax.scan(body, None, xs)
        return out.reshape(-1, 3)

    N = args.frames
    n_batches = N // B  # tail remainder (<120 rows) dropped
    all_rows = np.arange(n_batches * B).reshape(n_batches, B)
    preds = np.zeros((n_batches * B, 3), np.float32)
    t0 = time.time()
    for s in range(0, n_batches, K):
        grp = all_rows[s : s + K]
        if len(grp) < K:  # pad the last group to the compiled shape
            pad = np.repeat(grp[-1:], K - len(grp), axis=0)
            full = np.concatenate([grp, pad])
            out = np.asarray(eval_group(
                state.params, state.batch_stats, pages,
                table["speed"], table["command"], jnp.asarray(full)))
            preds[grp[0, 0] : grp[-1, -1] + 1] = out[: grp.size]
        else:
            out = np.asarray(eval_group(
                state.params, state.batch_stats, pages,
                table["speed"], table["command"], jnp.asarray(grp)))
            preds[grp[0, 0] : grp[-1, -1] + 1] = out
        if (s // K) % 5 == 0:
            print(f"  eval {s}/{n_batches} batches ({time.time()-t0:.0f}s)",
                  flush=True)

    n_eval = n_batches * B
    cmd = labels["command"][:n_eval]
    true = labels["controls"][:n_eval]
    err = np.abs(preds[:, 0] - true[:, 0])

    # Region x command table. Regions chosen at the structural boundaries:
    # page 1 (bit-shared prefix with r5e), page 2 rows still inside r5e's
    # 150k range, and the genuinely-new >150k tail.
    bounds = [0, page_rows, 150_000, n_eval]
    names = ["page1_(shared_prefix)", "page2_<150k", "page2_>150k_new"]
    out = {"frames": N, "page_rows": page_rows, "ckpt": args.ckpt,
           "regions": {}}
    print(f"\n  {'region':24s} {'rows':>7s}  FOLLOW   LEFT    RIGHT   STRAIGHT")
    for i, name in enumerate(names):
        lo, hi = bounds[i], bounds[i + 1]
        m = {}
        for c, cn in enumerate(["FOLLOW", "LEFT", "RIGHT", "STRAIGHT"]):
            sel = (cmd[lo:hi] == c)
            m[cn] = float(err[lo:hi][sel].mean()) if sel.any() else None
            m[cn + "_n"] = int(sel.sum())
        m["steer_mae"] = float(err[lo:hi].mean())
        out["regions"][name] = m
        print(f"  {name:24s} {hi-lo:7d}  "
              + "  ".join(f"{m[cn]:.4f}" if m[cn] is not None else "  -   "
                          for cn in ["FOLLOW", "LEFT", "RIGHT", "STRAIGHT"]))

    # Fine-grained 8k-row buckets of LEFT+RIGHT error: localizes any bad
    # region (e.g. a page-boundary block) instead of averaging it away.
    buckets = []
    for lo in range(0, n_eval, 8192):
        hi = min(lo + 8192, n_eval)
        sel = (cmd[lo:hi] == 1) | (cmd[lo:hi] == 2)
        buckets.append({
            "rows": [lo, hi],
            "turn_mae": float(err[lo:hi][sel].mean()) if sel.any() else None,
            "turn_n": int(sel.sum()),
            "all_mae": float(err[lo:hi].mean()),
        })
    out["buckets_8k"] = buckets
    print("\n  8k-bucket turn MAE:",
          " ".join(f"{b['turn_mae']:.3f}" if b["turn_mae"] is not None else "-"
                   for b in buckets))

    if args.save_preds:
        np.savez_compressed(args.save_preds, pred=preds, true=true, cmd=cmd,
                            speed_kmh=labels["speed_kmh"][:n_eval],
                            obstacle_dist=labels["obstacle_dist"][:n_eval],
                            tl_state=labels["tl_state"][:n_eval],
                            env=labels["env"][:n_eval])
        print(f"per-row predictions -> {args.save_preds}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
