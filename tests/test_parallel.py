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


def test_full_pipeline_dp_parity(mini_town):
    """Miniature COLLECT -> TRAIN -> EVAL on the 8-device mesh vs the single
    device path: identical data, sampler stream, and epochs must give the
    same val loss (up to float reduction order). This is what makes the
    pro-rata v5e-8 pipeline claim load-bearing: DP correctness is asserted
    over the whole production loop, not just one train step."""
    from cilrs_tpu.data.resident import collect_resident, labels_dataset
    from cilrs_tpu.data.dataset import DriveDataset
    from cilrs_tpu.ops.gather import gather_rows_paged
    from cilrs_tpu.train.loop import train

    table, labels, _ = collect_resident(
        mini_town, num_frames=160, num_envs=4, num_vehicles=3,
        num_pedestrians=2, weather_idx=None, seed=9, chunk_steps=25,
        cam=CameraSpec(width=64, height=32), verbose=False)
    D = 32 * 64 * 3
    imgs = np.concatenate([
        np.asarray(gather_rows_paged(
            table["images"], jnp.arange(s, min(s + 64, 160)),
            table["page_rows"]))[:, :D]
        for s in range(0, 160, 64)]).reshape(160, 32, 64, 3)
    ds = DriveDataset(images=imgs, speed_norm=labels["speed"],
                      command=labels["command"], controls=labels["controls"])

    cfg = TrainConfig(
        model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                          stage_sizes=(1, 1, 1, 1)),
        # ema_eval off: the EMA's decay schedule counts DISPATCHES (one per
        # 25-step scan group on the single-device path, one per step on the
        # sharded path), so the averaged iterates legitimately differ; the
        # parity claim is about the raw optimization trajectory.
        training=TrainingConfig(batch_size=16, epochs=1, ema_eval=False),
    )
    # One-step check: the sharded train step must compute the same loss and
    # the same updated params as the single-device step on an identical
    # batch. The forward runs in bfloat16, where an 8-way-split reduction
    # order legitimately shifts sums by ~1e-3 relative — the tolerances sit
    # just above that and far below any real DP bug (dropped shards or
    # double-scaled grads are >10% events).
    from cilrs_tpu.parallel.mesh import batch_spec, replicate
    from cilrs_tpu.train.state import create_train_state
    from cilrs_tpu.train.steps import make_train_step

    batch = {
        "images": jnp.asarray(imgs[:16]),
        "speed": jnp.asarray(labels["speed"][:16]),
        "command": jnp.asarray(labels["command"][:16]),
        "controls": jnp.asarray(labels["controls"][:16]),
    }
    rng_step = jax.random.PRNGKey(7)
    results = {}
    for n in (8, 1):
        mesh = make_mesh(n)
        st = create_train_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=6)
        st = jax.tree.map(
            lambda x: replicate(mesh, x) if isinstance(x, jax.Array) else x, st)
        b = jax.device_put(batch, batch_spec(mesh))
        st2, parts = jax.jit(make_train_step(cfg))(st, b, rng_step)
        results[n] = (float(parts["loss"]),
                      np.asarray(jax.tree.leaves(st2.params)[0]))
    assert abs(results[8][0] - results[1][0]) < 5e-3 * max(1.0, results[1][0])
    np.testing.assert_allclose(results[8][1], results[1][1], atol=5e-4)

    # Loose check, whole pipeline: 6 optimizer steps amplify reduction-order
    # noise through Adam's sign-sensitive m/sqrt(v) (near-zero grads flip),
    # so end-to-end val parity is approximate by nature — this bound still
    # catches any real DP bug (dropped shards, double-scaled grads).
    out8 = train(ds, cfg, steps_per_epoch=6, verbose=False, mesh=make_mesh(8))
    out1 = train(ds, cfg, steps_per_epoch=6, verbose=False, mesh=make_mesh(1))
    v8, v1 = out8["best_val_loss"], out1["best_val_loss"]
    assert np.isfinite(v8) and np.isfinite(v1)
    assert abs(v8 - v1) < 0.03 * max(1.0, abs(v1)), (v8, v1)
    t8 = out8["history"][0]["train_loss"]
    t1 = out1["history"][0]["train_loss"]
    assert abs(t8 - t1) < 0.03 * max(1.0, abs(t1)), (t8, t1)
