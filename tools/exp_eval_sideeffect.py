"""Does the epoch-end EVAL dispatch on a >2^33-byte table corrupt live buffers?

Every audited piece of the 200k pipeline is bit-faithful in isolation
(tables, standalone gathers, one instrumented 25-step train dispatch). The
one program the audits never exercised is the epoch-end eval: in fixed-table
mode it gathers VAL rows from the full collection table — including rows past
the 2^33-byte offset (row 161,320 at 53,248 B/row) on 200k tables. The healthy
runs' val rows never cross that line (150k table = 8.40 GB < 2^33); every
collapsed run's do. A DMA with a wrapped/overflowed offset inside that fused
program could corrupt OTHER live HBM buffers (the params!) as a side effect
while its own outputs remain plausible.

Probe: build the exact eval program shape (gather [K,B] rows -> scan of eval
steps), fingerprint the params tree bitwise before/after eval dispatches with
(a) safe row indices (< 150k) and (b) boundary-crossing indices (>= 161,320),
and re-run an identical safe eval after each to see whether its OUTPUTS drift.
Any params mutation or output drift after (b) is the smoking gun.
"""

from __future__ import annotations

import argparse
import functools

import os

import numpy as np

# Diagnostic tools deliberately build >2^33-byte tables (quarantined for
# production runs by data/resident.py).
os.environ.setdefault("CILRS_TPU_ALLOW_BIG_TABLE", "1")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200_000)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rounds", type=int, default=30,
                   help="boundary-crossing eval dispatches to fire")
    p.add_argument("--group", type=int, default=25,
                   help="scan steps per eval dispatch (real epoch-end eval "
                        "gathers the FULL val split in one call: 250)")
    p.add_argument("--interleave-train", action="store_true",
                   help="fire a donated train dispatch between crossing "
                        "evals (the real loop's buffer churn)")
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache()
    require_accelerator()

    import jax
    import jax.numpy as jnp

    from cilrs_tpu.config import load_train_config
    from cilrs_tpu.data.resident import collect_resident, unwrap_monolithic
    from cilrs_tpu.ops.gather import gather_rows
    from cilrs_tpu.train.state import create_train_state
    from cilrs_tpu.train.steps import make_eval_step

    net = build_map("town01")
    table, _, _ = collect_resident(net, args.frames, num_envs=args.envs,
                                   num_vehicles=12, num_pedestrians=6,
                                   weather_idx=None, seed=args.seed)
    table = unwrap_monolithic(table)
    cfg = load_train_config()
    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    dds = {k: table[k] for k in ("images", "speed", "command", "controls")}

    base_eval_step = make_eval_step(cfg)

    def _gather_group(dds, idxs):
        b = {k: v[idxs.reshape(-1)] for k, v in dds.items() if k != "images"}
        b["images"] = gather_rows(dds["images"], idxs.reshape(-1))[:, :D].reshape(
            (idxs.reshape(-1).shape[0],) + img_shape)
        return jax.tree.map(
            lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

    @jax.jit
    def eval_steps(state, dds, idxs):
        def body(_, batch):
            parts = base_eval_step(state, batch)
            return None, (parts["loss"], parts["cmd_steer_err_sum"],
                          parts["cmd_count"])

        _, outs = jax.lax.scan(body, None, _gather_group(dds, idxs))
        return outs

    def fingerprint(state):
        """Bitwise tree fingerprint (device-side XOR-free stand-in: exact sums
        of int32-reinterpreted leaves, fetched to host)."""
        tot = 0
        for leaf in jax.tree.leaves({"p": state.params, "b": state.batch_stats}):
            v = np.asarray(jax.device_get(leaf))
            tot = (tot + int(v.view(np.int32).astype(np.int64).sum())) % (1 << 61)
        return tot

    state = create_train_state(cfg, jax.random.PRNGKey(cfg.training.seed),
                               steps_per_epoch=1062)

    if args.interleave_train:
        from cilrs_tpu.train.steps import make_train_step
        import functools

        base_train_step = make_train_step(cfg)

        @functools.partial(jax.jit, donate_argnums=0)
        def train_steps(state, dds, idxs, rng):
            def body(st, batch):
                st2, parts = base_train_step(st, batch, rng)
                return st2, parts["loss"]

            return jax.lax.scan(body, state, _gather_group(dds, idxs))

    rng = np.random.RandomState(3)
    G = args.group
    safe = rng.randint(0, 150_000, size=(G, 120)).astype(np.int32)
    # Real val composition: rows spanning the whole table, ~19% past the
    # 2^33 boundary — not crossing-only (matches the r4f/r4e failure mode).
    cross = rng.randint(0, args.frames, size=(G, 120)).astype(np.int32)
    tr_idx = rng.randint(0, 150_000, size=(25, 120)).astype(np.int32)

    ref = jax.device_get(eval_steps(state, dds, jnp.asarray(safe)))
    fp0 = fingerprint(state)
    print(f"params fingerprint before: {fp0}")
    print(f"safe-eval loss[0] {float(ref[0][0]):.6f}  (group={G}, "
          f"interleave_train={args.interleave_train})")

    drift = False
    for r in range(args.rounds):
        if args.interleave_train:
            # Donated train dispatch: state buffers freed + reallocated —
            # the HBM churn the fixed-state probe lacked. Use a throwaway
            # state copy so the comparison state itself never moves.
            st2 = jax.tree.map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                state)
            st2, _ = train_steps(st2, dds, jnp.asarray(tr_idx),
                                 jax.random.PRNGKey(r))
            jax.block_until_ready(st2.step)
            del st2
        out = eval_steps(state, dds, jnp.asarray(cross))
        jax.block_until_ready(out[0])
        again = jax.device_get(eval_steps(state, dds, jnp.asarray(safe)))
        if not all(np.array_equal(a, b) for a, b in zip(ref, again)):
            print(f"  round {r}: SAFE EVAL OUTPUT DRIFTED after a "
                  f"boundary-crossing eval!")
            drift = True
            break
    fp1 = fingerprint(state)
    print(f"params fingerprint after {args.rounds} crossing evals: {fp1}")
    print("PARAMS MUTATED!" if fp1 != fp0 else "params unchanged")
    print("safe-eval outputs stable" if not drift else "safe-eval UNSTABLE")

    # Also: are the crossing-eval OUTPUTS themselves deterministic?
    a = jax.device_get(eval_steps(state, dds, jnp.asarray(cross)))
    b = jax.device_get(eval_steps(state, dds, jnp.asarray(cross)))
    det = all(np.array_equal(x, y) for x, y in zip(a, b))
    print(f"crossing-eval deterministic across calls: {det}")


if __name__ == "__main__":
    main()
