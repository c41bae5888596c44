"""Localize the 200k training collapse inside the train dispatch.

Facts so far (tools/exp_checksum.py, exp_table_integrity.py, exp_tail_poison.py):
  - the 150k table is a bit-identical prefix of the 200k table (labels AND
    image bytes — per-row weighted checksums match on all 150k rows);
  - standalone reads agree everywhere: Pallas gather_rows == dynamic_slice on
    every row of the 11.2 GB table;
  - yet the SAME recipe trained on rows < 150k collapses when the resident
    table is the 200k one (runs/r4f: LEFT steer MAE 0.0561/0.0550 fresh) and
    is healthy when it is the 150k one (runs/r4g == r4b bit-identical).

So the divergence must be created inside the compiled training dispatch —
jit(gather [25,120] rows -> scan of 25 train steps, donated state) — when the
table operand is big. This tool runs that EXACT program structure on both
table sizes with IDENTICAL global row indices (< 150k) from an IDENTICAL
initial state, and compares, per scan step:
  - a weighted checksum of the gathered image batch (computed INSIDE the same
    jit, before the train step consumes it);
  - the training loss;
  - a final params fingerprint.

Readout:
  checksums diverge             -> the gather is wrong IN CONTEXT (fusion /
                                   layout copy of the big operand), even
                                   though it is right standalone;
  checksums match, losses diverge -> post-gather numerics change with the
                                   table size (unexpected — the batch shapes
                                   are identical);
  all match                     -> the dispatch is innocent; the difference
                                   must be upstream (sampler/split membership).
"""

from __future__ import annotations

import argparse
import functools
import json

import os

import numpy as np

# Diagnostic tools deliberately build >2^33-byte tables (quarantined for
# production runs by data/resident.py).
os.environ.setdefault("CILRS_TPU_ALLOW_BIG_TABLE", "1")


def run_phase(frames, idxs_np, seed):
    import jax
    import jax.numpy as jnp

    from cilrs_tpu.cli.common import build_map
    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident, unwrap_monolithic
    from cilrs_tpu.ops.gather import gather_rows
    from cilrs_tpu.train.state import create_train_state
    from cilrs_tpu.train.steps import make_train_step

    net = build_map("town01")
    table, _, _ = collect_resident(net, frames, num_envs=16, num_vehicles=12,
                                   num_pedestrians=6, weather_idx=None,
                                   seed=seed)
    table = unwrap_monolithic(table)
    cfg = load_train_config()
    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    dds = {k: table[k] for k in ("images", "speed", "command", "controls")}

    base_train_step = make_train_step(cfg)
    w = (jnp.arange(D, dtype=jnp.uint32) % 251 + 1).astype(jnp.uint32)

    def _gather(dds, idx):
        b = {k: v[idx] for k, v in dds.items() if k != "images"}
        b["images"] = gather_rows(dds["images"], idx)[:, :D].reshape(
            (idx.shape[0],) + img_shape)
        return b

    def _gather_group(dds, idxs):
        b = _gather(dds, idxs.reshape(-1))
        return jax.tree.map(lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_steps_audit(state, dds, idxs, rng):
        group = _gather_group(dds, idxs)
        # Per-batch weighted image checksum, computed inside the SAME program
        # the train scan consumes (u8 path, before preprocess).
        imgs_u8 = (group["images"] * 1.0).astype(jnp.uint32)  # already uint8
        chk = (imgs_u8.reshape(idxs.shape[0], -1)
               * jnp.tile(w, idxs.shape[1])).sum(axis=1)

        def body(st, batch):
            st2, parts = base_train_step(st, batch, rng)
            return st2, parts["loss"]

        state, losses = jax.lax.scan(body, state, group)
        return state, losses, chk

    state = create_train_state(cfg, jax.random.PRNGKey(cfg.training.seed),
                               steps_per_epoch=1062)
    state, losses, chk = train_steps_audit(
        state, dds, jnp.asarray(idxs_np), jax.random.PRNGKey(123))
    fp = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(state.params)))
    out = {
        "frames": frames,
        "losses": np.asarray(jax.device_get(losses)).tolist(),
        "checksums": np.asarray(jax.device_get(chk)).tolist(),
        "params_fingerprint": fp,
    }
    del table, dds, state
    import gc
    gc.collect()
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--small", type=int, default=150_000)
    p.add_argument("--big", type=int, default=200_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/dispatch_divergence.json")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()

    rng = np.random.RandomState(7)
    idxs = rng.randint(0, args.small, size=(25, 120)).astype(np.int32)

    print(f"=== phase A: table {args.small} ===", flush=True)
    a = run_phase(args.small, idxs, args.seed)
    print(f"=== phase B: table {args.big} ===", flush=True)
    b = run_phase(args.big, idxs, args.seed)

    chk_same = a["checksums"] == b["checksums"]
    n_chk = sum(int(x != y) for x, y in zip(a["checksums"], b["checksums"]))
    print(f"gathered-batch checksums: {'MATCH' if chk_same else 'DIVERGE'} "
          f"({n_chk}/25 steps differ)")
    dl = [abs(x - y) for x, y in zip(a["losses"], b["losses"])]
    print(f"losses: max |delta| {max(dl):.3e}  "
          f"(A[0]={a['losses'][0]:.4f}, B[0]={b['losses'][0]:.4f}, "
          f"A[-1]={a['losses'][-1]:.4f}, B[-1]={b['losses'][-1]:.4f})")
    print(f"params fingerprint: A {a['params_fingerprint']:.6e}  "
          f"B {b['params_fingerprint']:.6e}")

    with open(args.out, "w") as f:
        json.dump({"small": a, "big": b}, f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
