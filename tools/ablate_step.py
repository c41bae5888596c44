"""Fidelity-feature ablation: what each render/perception feature costs inside
the REAL fused chunk (not standalone sub-programs — XLA fusion changes costs).

Monkeypatches one feature off at a time, rebuilds the jitted chunk, and
reports steady-state env-steps/s. The deltas are the committed per-phase cost
table (VERDICT r2 item 1). Usage:

    JAX_PLATFORMS='' python tools/ablate_step.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator

enable_compilation_cache()
require_accelerator()

import jax
import jax.numpy as jnp

E = int(os.environ.get("BENCH_ENVS", "128"))
T = int(os.environ.get("BENCH_TICKS", "50"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def build_and_run(tag):
    from cilrs_tpu.agent.driver import fleet_rollout, make_driver_state
    from cilrs_tpu.agent.scenario import spawn_world
    from cilrs_tpu.config import TrainConfig, ModelConfig, load_weather_table
    from cilrs_tpu.core.state import default_vehicle_params
    from cilrs_tpu.maps.routing import chained_route_pool
    from cilrs_tpu.maps.town import make_town01
    from cilrs_tpu.train.state import create_train_state

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

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(st, net_, pool_, variables_):
        final, _ = fleet_rollout(
            st, steps=T, net=net_, pool=pool_, wt=wt, params=params,
            apply_fn=state.apply_fn, variables=variables_, mode="drive",
            want_frames=False,
        )
        return final

    t0 = time.time()
    fleet = chunk(fleet, net, pool, variables)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        fleet = chunk(fleet, net, pool, variables)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    dt = time.time() - t0
    rate = E * T * REPS / dt
    ms_tick = dt / REPS / T * 1e3
    print(f"{tag:28s} {rate:10,.0f} env-steps/s  {ms_tick:7.3f} ms/tick  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return rate


def main():
    from cilrs_tpu.agent import perception
    from cilrs_tpu.render import raster

    results = {}
    results["baseline"] = build_and_run("baseline")

    # -- motion blur off --
    orig_blur = raster.motion_blur
    raster.motion_blur = lambda img, s: img
    results["no_motion_blur"] = build_and_run("no motion blur")
    raster.motion_blur = orig_blur

    # -- ground grain off --
    orig_hash = raster._hash2
    raster._hash2 = lambda p, c: jnp.asarray(0.5, jnp.float32)
    results["no_grain"] = build_and_run("no ground grain")
    raster._hash2 = orig_hash

    # -- buildings off --
    orig_kb = raster.NUM_NEAR_BUILDINGS
    raster.NUM_NEAR_BUILDINGS = 0
    results["no_buildings"] = build_and_run("no buildings")
    raster.NUM_NEAR_BUILDINGS = orig_kb

    # -- predictive obstacle horizons off --
    orig_h = perception.PREDICT_HORIZONS
    perception.PREDICT_HORIZONS = (0.0,)
    results["no_predict"] = build_and_run("instantaneous obstacles")
    perception.PREDICT_HORIZONS = orig_h

    # -- fewer ground segments --
    orig_k = raster.NUM_NEAR_SEGMENTS
    raster.NUM_NEAR_SEGMENTS = 48
    results["k48_segments"] = build_and_run("ground segments K=48")
    raster.NUM_NEAR_SEGMENTS = orig_k

    base = results["baseline"]
    print("\nfeature costs (vs baseline):")
    for k, v in results.items():
        if k == "baseline":
            continue
        print(f"  {k:24s} +{v - base:8,.0f} env-steps/s when disabled "
              f"({(v - base) / base * 100:+.1f}%)")


if __name__ == "__main__":
    main()
