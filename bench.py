"""Headline benchmark: batched closed-loop env-steps/sec on one chip.

One env step = render (200x88 raycast camera) + CILRS ResNet-34 policy forward
+ perception + safety cascade + NPC traffic + physics + metrics — i.e. what the
reference achieves at ~10-15 FPS for ONE env against an external CARLA server on
an RTX 4060 (BASELINE.md "sim loop rate"). The north-star target is 100k
env-steps/s on a v5e-8 pod => 12,500 per chip (BASELINE.json); vs_baseline is
measured against that per-chip target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cilrs_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    # Multi-process init MUST precede any backend use (jax.devices() / jnp
    # array creation): jax.distributed.initialize() raises once the backend
    # exists. No-op for single-process runs.
    from cilrs_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    from cilrs_tpu.agent.driver import fleet_rollout, make_driver_state
    from cilrs_tpu.agent.scenario import spawn_world
    from cilrs_tpu.config import TrainConfig, ModelConfig, load_weather_table
    from cilrs_tpu.core.state import default_vehicle_params
    from cilrs_tpu.maps.routing import chained_route_pool
    from cilrs_tpu.maps.town import make_town01
    from cilrs_tpu.train.state import create_train_state

    E = int(os.environ.get("BENCH_ENVS", "128"))
    # 50-tick chunks amortize per-dispatch tunnel latency (measured: T=20
    # -> 12.2k, T=50 -> 12.7k steps/s; E=256 is SLOWER than 128 - worse tiling).
    T = int(os.environ.get("BENCH_TICKS", "50"))
    REPS = int(os.environ.get("BENCH_REPS", "5"))

    net = make_town01(blocks_x=3, blocks_y=3)
    rng = np.random.RandomState(0)
    wt = load_weather_table()
    params = default_vehicle_params()
    pool = chained_route_pool(net, rng, num_routes=3)

    world = spawn_world(net, num_vehicles=12, num_pedestrians=5, rng=rng)
    base = make_driver_state(world)
    fleet = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape).copy(), base)
    fleet = fleet.replace(world=fleet.world.replace(
        rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(E, dtype=jnp.uint32)),
        weather_idx=jnp.arange(E, dtype=jnp.int32) % 5,
    ))

    cfg = TrainConfig(model=ModelConfig(dropout=0.0))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = state.apply_fn

    n_dev = len(jax.devices())
    if n_dev > 1:
        # Auto-scale: shard the env fleet over every device (DP over ICI).
        from cilrs_tpu.parallel.fleet import make_sharded_rollout
        from cilrs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        run = make_sharded_rollout(
            mesh, steps=T, wt=wt, params=params, apply_fn=apply_fn,
            mode="drive", want_frames=False,
        )

        def chunk(st, net_, pool_, variables_):
            final, _ = run(st, net_, pool_, variables_)
            return final
    else:
        @functools.partial(jax.jit, donate_argnums=0)
        def chunk(st, net_, pool_, variables_):
            final, _ = fleet_rollout(
                st, steps=T, net=net_, pool=pool_, wt=wt, params=params,
                apply_fn=apply_fn, variables=variables_, mode="drive",
                want_frames=False,
            )
            return final

    # Warmup / compile.
    t_c = time.time()
    fleet = chunk(fleet, net, pool, variables)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    compile_s = time.time() - t_c
    print(f"# compile+first chunk: {compile_s:.1f}s", file=sys.stderr)
    if compile_s > 120.0:
        # Guard for the <120 s cold-start bar (docs/PERF.md): a slow first
        # chunk here means the persistent cache missed (code drift without a
        # warm run, or a cleared .jax_cache) or a remote-compile outlier —
        # flagged loudly instead of silently folded into a one-off number.
        print(f"# WARNING: cold compile {compile_s:.1f}s exceeds the 120 s "
              f"bar — compilation cache likely missed (see docs/PERF.md)",
              file=sys.stderr)

    t0 = time.time()
    for _ in range(REPS):
        fleet = chunk(fleet, net, pool, variables)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    dt = time.time() - t0

    steps = E * T * REPS
    rate = steps / dt / n_dev  # per-chip rate (fleet shards evenly over devices)
    target_per_chip = 100_000 / 8.0
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": f"env-steps/s (render+policy+dynamics, per chip of {n_dev})",
        "vs_baseline": round(rate / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
