"""Does the training loop's epoch-end EVAL dispatch mutate the PAGE buffers?

Round-6 lead: the collapse follows training streams that gather page-2 rows,
train batches checksum bit-exact when instrumented (train_gather_probe), and
r5f/r6a show inflated turn errors already at the FIRST epoch-end eval. One
mechanism fits: the loop's eval program (non-donated [K,120]-group scan over
the 2-page gather) corrupts table pages as a side effect; training then
consumes poisoned rows from the next dispatch on.

Probe: factored-hash fingerprints of BOTH page buffers (exact, order
sensitive) before/after (a) repeated loop-shape eval dispatches with
val-like full-range indices, (b) the same with donated train dispatches
interleaved (the real loop's buffer churn). Any page fingerprint change is
the smoking gun; params are fingerprinted too.

Usage: PYTHONPATH=... python tools/exp_eval_page_mutation.py
"""
from __future__ import annotations

import argparse
import functools
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=176_256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--out", default="runs/eval_page_mutation.json")
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
    from cilrs_tpu.train.steps import make_eval_step, make_train_step

    net = build_map("town01")
    table, labels, stats = collect_resident(
        net, args.frames, num_envs=16, num_vehicles=12, num_pedestrians=6,
        weather_idx=None, seed=args.seed)
    page_rows = int(table["page_rows"])
    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    cfg = load_train_config()
    ds = labels_dataset(labels)
    dds = {k: table[k] for k in ("images", "speed", "command", "controls")}

    # Exact order-sensitive factored-hash fingerprint of a [S, R, 128] page:
    # ck = sum_s h1[s] * (sum_d page[s, d] * h2[d])   (uint32 wrap math)
    MIX1, MIX2 = np.uint32(2654435761), np.uint32(40503)

    @jax.jit
    def page_fp(pg):
        s, r, lane = pg.shape
        d = r * lane
        h2 = (jnp.arange(d, dtype=jnp.uint32) * MIX2 + 1).reshape(r, lane)
        row = jnp.sum(pg.astype(jnp.uint32) * h2[None], axis=(1, 2),
                      dtype=jnp.uint32)  # [S]
        h1 = jnp.arange(s, dtype=jnp.uint32) * MIX1 + 1
        return jnp.sum(row * h1, dtype=jnp.uint32)

    def all_fps():
        return [int(page_fp(pg)) for pg in dds["images"]]

    # ---- the loop's EXACT eval/train program shapes (train/loop.py) ----
    base_eval_step = make_eval_step(cfg)
    base_train_step = make_train_step(cfg)

    def _gather(dds_, idx):
        b = {k: v[idx] for k, v in dds_.items() if k != "images"}
        b["images"] = gather_rows_paged(dds_["images"], idx, page_rows)[:, :D].reshape(
            (idx.shape[0],) + img_shape)
        return b

    def _gather_group(dds_, idxs):
        b = _gather(dds_, idxs.reshape(-1))
        return jax.tree.map(lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_steps(state, dds_, idxs, rng):
        def body(st, batch):
            st2, parts = base_train_step(st, batch, rng)
            return st2, parts["loss"]

        return jax.lax.scan(body, state, _gather_group(dds_, idxs))

    @jax.jit
    def eval_steps(state, dds_, idxs):
        def body(_, batch):
            parts = base_eval_step(state, batch)
            return None, (parts["loss"], parts["cmd_steer_err_sum"],
                          parts["cmd_count"])

        _, outs = jax.lax.scan(body, None, _gather_group(dds_, idxs))
        return outs

    train_idx, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                          cfg.training.seed)
    B = cfg.training.batch_size
    spe = max(1, len(train_idx) // B)
    sampler = WeightedBatchSampler(
        ds.command[train_idx], B, cfg.training.seed,
        controls=ds.controls[train_idx],
        hard_boost=cfg.training.hard_frame_boost)
    rng = jax.random.PRNGKey(cfg.training.seed + 1)
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.training.seed), spe)

    vi = np.stack([val_idx[s : s + B] for s in
                   range(0, len(val_idx) - B + 1, B)])  # [Kv, B]
    its = list(sampler.epoch(spe))

    fp_init = all_fps()
    print(f"page fingerprints init: {fp_init}", flush=True)

    log = {"init": fp_init, "rounds": []}
    mutated = False
    for r in range(args.rounds):
        # (a) the real epoch-end eval: 50-batch groups over the val split
        for s in range(0, len(vi), 50):
            grp = vi[s : s + 50]
            if len(grp) < 50:
                break
            jax.block_until_ready(eval_steps(state, dds, jnp.asarray(grp)))
        fp_e = all_fps()
        # (b) the real train churn: one 25-step donated dispatch
        grp = train_idx[np.stack(its[(r * 25) % (len(its) - 25):][:25])]
        state, _ = train_steps(state, dds, jnp.asarray(grp), rng)
        jax.block_until_ready(state.params)
        fp_t = all_fps()
        changed_e = fp_e != fp_init
        changed_t = fp_t != fp_init
        mutated |= changed_e or changed_t
        log["rounds"].append({"after_eval": fp_e, "after_train": fp_t,
                              "changed_eval": changed_e,
                              "changed_train": changed_t})
        print(f"round {r}: after_eval {fp_e} changed={changed_e} | "
              f"after_train {fp_t} changed={changed_t}", flush=True)

    log["mutated"] = mutated
    with open(args.out, "w") as f:
        json.dump(log, f, indent=1)
    print("\n  -> " + ("PAGE BUFFERS MUTATED — eval/train dispatch side "
                       "effect pinned" if mutated else
                       "pages stable across eval+train dispatches"))
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
