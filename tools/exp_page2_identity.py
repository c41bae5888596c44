"""Page-2 identity test: train on IDENTICAL data addressed through page 1
vs page 2 of a duplicated-page table, and compare the resulting params.

Round-6 state: any train stream that gathers from page 2 collapses turns
(r5f, r6a with a FRESH healthy world in page 2, late_only), while page-1-only
training is healthy (early_only, r5e) — yet checksums taken INSIDE an
instrumented train dispatch are bit-exact (runs/train_gather_probe.json).
If the un-instrumented program corrupts page-2 batches (an aliasing/race the
probe's extra outputs masked), then training the SAME batches via page-2
addressing must yield different params than via page-1 addressing.

Setup: one 88,128-frame single-page collection T. Table T2 has pages
(T, T) — global row g and g+page_rows hold the SAME frame. Runs:
  A: train K dispatches on T  (single-page program)      -> params_A
  B: train K dispatches on T2, indices as-is (page 1)    -> params_B
  C: train K dispatches on T2, indices + page_rows (p2)  -> params_C

B == A: the 2-page program with page-1 addressing is faithful.
C == B: page-2 addressing is faithful -> data path really is clean.
C != B: page-2 addressing corrupts training -> compiled-program bug pinned.

Usage: PYTHONPATH=... python tools/exp_page2_identity.py
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def fingerprint(tree):
    """Bit-exact digest of every leaf."""
    import hashlib

    import jax

    h = hashlib.md5()
    for l in jax.tree.leaves(tree):
        h.update(np.asarray(l).tobytes())
    return h.hexdigest()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=88_128)
    p.add_argument("--groups", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/page2_identity.json")
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
    assert stats["num_pages"] == 1, "need a single-page base table"
    (page,) = table["images"]
    page_rows = args.frames  # logical rows of the base table

    ds = labels_dataset(labels)
    cfg = load_train_config()
    train_idx, _ = stratified_split(ds, cfg.training.val_fraction,
                                    cfg.training.seed)
    B = cfg.training.batch_size
    spe = max(1, len(train_idx) // B)
    sampler = WeightedBatchSampler(
        ds.command[train_idx], B, cfg.training.seed,
        controls=ds.controls[train_idx],
        hard_boost=cfg.training.hard_frame_boost)
    rng = jax.random.PRNGKey(cfg.training.seed + 1)
    base_train_step = make_train_step(cfg)

    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))

    # Duplicated labels for the 2-page table (global rows 0..2N-1).
    lab2 = {k: jnp.concatenate([table[k], table[k]])
            for k in ("speed", "command", "controls")}
    lab1 = {k: table[k] for k in ("speed", "command", "controls")}

    def make_train_fn(n_pages):
        @functools.partial(jax.jit, donate_argnums=0)
        def train_steps(state, dds, idxs, r):
            def gather(idx):
                b = {k: v[idx] for k, v in dds.items() if k != "images"}
                b["images"] = gather_rows_paged(
                    dds["images"], idx, page_rows)[:, :D].reshape(
                    (idx.shape[0],) + img_shape)
                return b

            b = gather(idxs.reshape(-1))
            b = jax.tree.map(lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

            def body(st, batch):
                st2, parts = base_train_step(st, batch, r)
                return st2, parts["loss"]

            return jax.lax.scan(body, state, b)

        return train_steps

    train_1p = make_train_fn(1)
    train_2p = make_train_fn(2)

    its = list(sampler.epoch(spe))
    STEPS = 25
    groups = [train_idx[np.stack(its[s : s + STEPS])]
              for s in range(0, len(its), STEPS)][: args.groups]
    groups = [g for g in groups if g.shape[0] == STEPS]

    def run(train_fn, dds, offset):
        st = create_train_state(cfg, jax.random.PRNGKey(cfg.training.seed), spe)
        losses = []
        for g in groups:
            st, l = train_fn(st, dds, jnp.asarray(g + offset), rng)
            losses.append(np.asarray(l))
        jax.block_until_ready(st.params)
        return st, np.concatenate(losses)

    # page 2 is a REAL copy (distinct 4.7 GB HBM buffer): the production
    # failure may depend on the second physical allocation, which a shared
    # buffer would mask.
    import jax.numpy as jnp2
    page2 = jax.block_until_ready(jnp2.copy(page))

    print("=== run A: single-page table ===", flush=True)
    stA, lA = run(train_1p, dict(images=(page,), **lab1), 0)
    print("=== run B: duplicated 2-page table, page-1 addressing ===", flush=True)
    stB, lB = run(train_2p, dict(images=(page, page2), **lab2), 0)
    print("=== run C: duplicated 2-page table, page-2 addressing ===", flush=True)
    stC, lC = run(train_2p, dict(images=(page, page2), **lab2), page_rows)

    fpA, fpB, fpC = (fingerprint({"p": s.params, "bs": s.batch_stats})
                     for s in (stA, stB, stC))
    same_AB = fpA == fpB
    same_BC = fpB == fpC
    loss_AB = float(np.max(np.abs(lA - lB)))
    loss_BC = float(np.max(np.abs(lB - lC)))
    out = {
        "groups": len(groups),
        "loss_maxdiff_AB": loss_AB,
        "loss_maxdiff_BC": loss_BC,
        "params_equal_AB": bool(same_AB),
        "params_equal_BC": bool(same_BC),
        "lossA_head": [float(x) for x in lA[:5]],
        "lossC_head": [float(x) for x in lC[:5]],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n  A==B (1-page vs 2-page/page-1): params {same_AB}, "
          f"loss maxdiff {loss_AB:.3e}")
    print(f"  B==C (page-1 vs page-2 addressing): params {same_BC}, "
          f"loss maxdiff {loss_BC:.3e}")
    verdict = ("PAGE-2 TRAIN READS CORRUPT (compiled-program bug pinned)"
               if not same_BC else
               "page-2 addressing faithful — bug is NOT in the train gather")
    print(f"  -> {verdict}")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
