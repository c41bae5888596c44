"""Checksum the batches INSIDE the real (donated, scanned, 2-page-gather)
train dispatch against independently gathered copies of the same rows.

runs/cross_eval.json exonerated the 176k table's content and the paged
gather in a clean standalone dispatch; r5f still collapsed from epoch 1 with
normal train loss. The remaining suspects are properties of the TRAINING
program itself: the paged gather embedded in a donate_argnums=0 dispatch
with a 25-step lax.scan. This probe reproduces the training loop's exact
setup (split, sampler stream, state init, group shapes — train/loop.py) and
runs REAL train dispatches whose bodies additionally emit per-batch image /
label checksums, then recomputes every checksum in a fresh non-donated
dispatch. Any divergence is the smoking gun; bit-equality exonerates the
train-side data path entirely.

Usage: PYTHONPATH=/root/repo:... python tools/exp_train_gather_probe.py \
          [--frames 176256] [--groups 50]
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--groups", type=int, default=50, help="25-step dispatches to probe (50 = 1 epoch at 150k)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/train_gather_probe.json")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache(); require_accelerator()

    import jax
    import jax.numpy as jnp

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.dataset import WeightedBatchSampler, stratified_split
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.ops.gather import gather_rows_paged
    from cilrs_tpu.train.state import create_train_state
    from cilrs_tpu.train.steps import make_train_step

    net = build_map("town01")
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    page_rows = int(table["page_rows"])
    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    ds = labels_dataset(labels)
    cfg = load_train_config()

    # ---- exact training-loop setup (train/loop.py) ----
    train_idx, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                          cfg.training.seed)
    B = cfg.training.batch_size
    spe = max(1, len(train_idx) // B)
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.training.seed), spe)
    sampler = WeightedBatchSampler(
        ds.command[train_idx], B, cfg.training.seed,
        controls=ds.controls[train_idx],
        hard_boost=cfg.training.hard_frame_boost)
    rng = jax.random.PRNGKey(cfg.training.seed + 1)
    base_train_step = make_train_step(cfg)

    dev = {k: table[k] for k in ("images", "speed", "command", "controls")}

    def _gather(dds, idx):
        b = {k: v[idx] for k, v in dds.items() if k != "images"}
        b["images"] = gather_rows_paged(dds["images"], idx, page_rows)[:, :D].reshape(
            (idx.shape[0],) + img_shape)
        return b

    def _gather_group(dds, idxs):
        b = _gather(dds, idxs.reshape(-1))
        return jax.tree.map(lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

    MIX = 2654435761  # Knuth multiplicative hash — order-sensitive checksums

    def _cksum(batch):
        img = batch["images"].astype(jnp.uint32)
        k = (jnp.arange(img.size, dtype=jnp.uint32) * jnp.uint32(MIX)).reshape(img.shape)
        ck_i = jnp.sum(img * k, dtype=jnp.uint32)
        lab = jnp.concatenate([
            batch["speed"].reshape(-1), batch["command"].astype(jnp.float32),
            batch["controls"].reshape(-1)])
        ck_l = jnp.sum(jax.lax.bitcast_convert_type(lab, jnp.uint32)
                       * jnp.uint32(MIX), dtype=jnp.uint32)
        return ck_i, ck_l

    # ---- probe program: REAL train dispatch + per-batch checksums ----
    @functools.partial(jax.jit, donate_argnums=0)
    def train_probe(st, dds, idxs, r):
        def body(s, batch):
            ck_i, ck_l = _cksum(batch)
            s2, parts = base_train_step(s, batch, r)
            return s2, (parts["loss"], ck_i, ck_l)

        return jax.lax.scan(body, st, _gather_group(dds, idxs))

    # ---- reference checksums: fresh, non-donated, ONE batch per dispatch
    # (independent program structure — no scan, no donation, no grouping) ----
    @jax.jit
    def ref_cksum_batch(dds, idx):  # idx [B]
        return _cksum(_gather(dds, idx))

    def host_label_cksum(idx):
        # Fully device-free recomputation from the host label copies
        # (element-wise wrap-mod-2^32 product, then wrapped sum — matches
        # the device uint32 arithmetic exactly).
        lab = np.concatenate([
            labels["speed"][idx].astype(np.float32).reshape(-1),
            labels["command"][idx].astype(np.float32),
            labels["controls"][idx].astype(np.float32).reshape(-1)])
        prod = (lab.view(np.uint32).astype(np.uint64) * np.uint64(MIX)) & 0xFFFFFFFF
        return np.uint32(prod.sum() & 0xFFFFFFFF)

    STEPS_PER_CALL = 25
    its = list(sampler.epoch(spe))
    groups = []
    for s in range(0, len(its), STEPS_PER_CALL):
        grp = np.stack(its[s : s + STEPS_PER_CALL])
        groups.append(train_idx[grp])
    groups = groups[: args.groups]

    probe_out, losses = [], []
    mism = []
    for gi, grp in enumerate(groups):
        gj = jnp.asarray(grp)
        state, (loss, ck_i, ck_l) = train_probe(state, dev, gj, rng)
        pi, plb = np.asarray(ck_i), np.asarray(ck_l)
        losses.append(np.asarray(loss))
        for b in range(len(grp)):
            r_i, r_l = ref_cksum_batch(dev, jnp.asarray(grp[b]))
            h_l = host_label_cksum(grp[b])
            if pi[b] != np.uint32(r_i):
                mism.append({"group": gi, "batch": b, "kind": "images"})
            if plb[b] != np.uint32(r_l):
                mism.append({"group": gi, "batch": b, "kind": "labels-dev"})
            if plb[b] != h_l:
                mism.append({"group": gi, "batch": b, "kind": "labels-host",
                             "dev": int(plb[b]), "host": int(h_l)})
        if gi % 10 == 0:
            print(f"  group {gi}/{len(groups)} loss {np.mean(losses[-1]):.4f} "
                  f"mismatches so far {len(mism)}", flush=True)

    # Sampler-stream sanity at this scale: turn fraction per group.
    cmds = ds.command
    turn_frac = [float(np.mean((cmds[g.reshape(-1)] == 1)
                               | (cmds[g.reshape(-1)] == 2))) for g in groups]

    out = {
        "frames": args.frames, "page_rows": page_rows,
        "groups_probed": len(groups),
        "batches_probed": sum(len(g) for g in groups),
        "mismatches": mism[:200],
        "mismatch_count": len(mism),
        "first_group_losses": [float(x) for x in losses[0]],
        "last_group_losses": [float(x) for x in losses[-1]],
        "turn_fraction_per_group": turn_frac,
        "turn_fraction_mean": float(np.mean(turn_frac)),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    verdict = ("DIVERGED — train-dispatch gather corrupts batches"
               if mism else
               "BIT-EXACT — the donated train dispatch consumes exactly the "
               "rows the sampler asked for; data path exonerated end-to-end")
    print(f"\n  {len(mism)} checksum mismatches over "
          f"{out['batches_probed']} batches -> {verdict}")
    print(f"  turn fraction mean {out['turn_fraction_mean']:.3f}")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
