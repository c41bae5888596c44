"""Multi-device (8 virtual CPU) tests for the distributed layer:
sharded fleet rollout, shard_map'd fused collect->train, distributed init.

These exercise the real multi-chip program structure (SURVEY.md §4): env batch
sharded over the mesh's data axis, params replicated, DP gradient pmean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilrs_tpu.config import ModelConfig, TrainConfig, TrainingConfig
from cilrs_tpu.parallel.mesh import DATA_AXIS, make_mesh
from cilrs_tpu.render.camera import CameraSpec

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _tiny_cfg(n_batch):
    return TrainConfig(
        model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                          stage_sizes=(1, 1, 1, 1)),
        training=TrainingConfig(batch_size=n_batch),
    )


def _make_fleet(net, E, seed=0):
    from cilrs_tpu.agent.driver import make_driver_state
    from cilrs_tpu.agent.scenario import spawn_world

    rng = np.random.RandomState(seed)
    world = spawn_world(net, num_vehicles=3, num_pedestrians=2, rng=rng)
    base = make_driver_state(world)
    fleet = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape).copy(), base)
    return fleet.replace(world=fleet.world.replace(
        rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(E, dtype=jnp.uint32)),
        weather_idx=jnp.arange(E, dtype=jnp.int32) % 5,
    ))


def test_sharded_fleet_rollout_collect(mini_town, rng):
    from cilrs_tpu.config import load_weather_table
    from cilrs_tpu.core.state import default_vehicle_params
    from cilrs_tpu.maps.routing import chained_route_pool
    from cilrs_tpu.parallel.fleet import make_sharded_rollout

    mesh = make_mesh(8)
    E = 16
    fleet = _make_fleet(mini_town, E)
    pool = chained_route_pool(mini_town, rng, num_routes=2, min_dist=40.0,
                              max_dist=250.0)
    run = make_sharded_rollout(
        mesh, steps=6, wt=load_weather_table(), params=default_vehicle_params(),
        mode="collect", cam=CameraSpec(width=64, height=32), want_frames=False,
    )
    fleet2, outs = run(fleet, mini_town, pool)
    d = np.asarray(fleet2.metrics.total_distance)
    assert d.shape == (E,) and np.isfinite(d).all()
    assert outs["speed_kmh"].shape == (6, E)
    # The env axis really is sharded over the mesh.
    shardings = {
        str(s) for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding.spec, fleet2))
    }
    assert str(jax.sharding.PartitionSpec(DATA_AXIS)) in shardings


def test_fused_collect_train_sharded(mini_town):
    from cilrs_tpu.train.fused import fused_collect_train

    mesh = make_mesh(8)
    out = fused_collect_train(
        mini_town,
        cfg=_tiny_cfg(16),
        num_envs=8,
        num_vehicles=3,
        num_pedestrians=2,
        buffer_frames=1024,
        collect_ticks=4,
        train_steps_per_chunk=2,
        total_train_steps=4,
        warmup_chunks=4,
        cam=CameraSpec(width=64, height=32),
        eval_every=2,
        verbose=False,
        mesh=mesh,
    )
    assert out["frames_collected"] > 0
    assert out["history"], "no eval points recorded"
    for h in out["history"]:
        assert np.isfinite(h["val_loss"]), h
    # Params stayed replicated (DP): same value on every device.
    leaf = jax.tree.leaves(out["state"].params)[0]
    assert leaf.sharding.is_fully_replicated


def test_initialize_distributed_noop_single_process(monkeypatch):
    from cilrs_tpu.parallel import distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize_distributed() is False
    assert distributed.is_coordinator() is True
