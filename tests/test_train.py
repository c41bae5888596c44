import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cilrs_tpu.config import TrainConfig, ModelConfig, TrainingConfig, OptimizerConfig
from cilrs_tpu.data.dataset import (
    WeightedBatchSampler, command_weights, make_synthetic_dataset, stratified_split,
)
from cilrs_tpu.parallel.mesh import batch_spec, make_mesh, replicate
from cilrs_tpu.train import create_train_state, make_eval_step, make_train_step
from cilrs_tpu.train.state import step_lr

SMALL = TrainConfig(
    model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                      stage_sizes=(1, 1, 1, 1)),
    training=TrainingConfig(batch_size=8, epochs=2),
)


def _batch(ds, idx):
    return {
        "images": jnp.asarray(ds.images[idx]),
        "speed": jnp.asarray(ds.speed_norm[idx]),
        "command": jnp.asarray(ds.command[idx]),
        "controls": jnp.asarray(ds.controls[idx]),
    }


def test_stratified_split_and_weights():
    ds = make_synthetic_dataset(400)
    tr, va = stratified_split(ds, 0.15, 42)
    assert len(tr) + len(va) == 400
    assert abs(len(va) / 400 - 0.15) < 0.03
    assert len(np.intersect1d(tr, va)) == 0
    # Weights: rare commands get more probability mass per sample.
    cmd = np.array([0] * 90 + [1] * 10)
    w = command_weights(cmd)
    assert w[-1] > w[0] * 5
    np.testing.assert_allclose(w.sum(), 1.0)
    # Sampler oversamples the rare class.
    s = WeightedBatchSampler(cmd, 1000, seed=0)
    counts = np.bincount(cmd[s()], minlength=2)
    assert counts[1] > 300  # ~50% expected vs 10% base rate


def test_train_step_decreases_loss():
    ds = make_synthetic_dataset(64, h=32, w=64)
    state = create_train_state(SMALL, jax.random.PRNGKey(0), steps_per_epoch=100)
    train_step = jax.jit(make_train_step(SMALL), donate_argnums=0)
    batch = _batch(ds, np.arange(8))
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, parts = train_step(state, batch, rng)
        losses.append(float(parts["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_eval_step_cmd_errors():
    ds = make_synthetic_dataset(32, h=32, w=64)
    state = create_train_state(SMALL, jax.random.PRNGKey(0))
    eval_step = jax.jit(make_eval_step(SMALL))
    parts = eval_step(state, _batch(ds, np.arange(16)))
    assert parts["cmd_steer_err_sum"].shape == (4,)
    assert float(jnp.sum(parts["cmd_count"])) == 16.0
    assert parts["pred"].shape == (16, 4)


def test_step_lr_schedule():
    cfg = OptimizerConfig(learning_rate=1e-4, lr_step_epochs=8, lr_step_gamma=0.5)
    sched = step_lr(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(79)) == pytest.approx(1e-4)  # epoch 7
    assert float(sched(80)) == pytest.approx(5e-5)  # epoch 8
    assert float(sched(160)) == pytest.approx(2.5e-5)


def test_checkpoint_save_resume(tmp_path):
    from cilrs_tpu.train.checkpoint import restore_best_params, restore_latest, save_checkpoint

    state = create_train_state(SMALL, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(123, jnp.int32))
    save_checkpoint(str(tmp_path / "ck"), state, epoch=3, val_loss=0.5, is_best=True)

    fresh = create_train_state(SMALL, jax.random.PRNGKey(7))
    restored, epoch, val = restore_latest(str(tmp_path / "ck"), fresh)
    assert epoch == 3 and val == 0.5
    assert int(restored.step) == 123
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))

    best = restore_best_params(str(tmp_path / "ck"), fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(best.params)[0]), np.asarray(p0)
    )


def test_train_step_sharded_8dev():
    """DP over the virtual 8-device mesh: batch sharded, params replicated."""
    assert jax.device_count() == 8
    mesh = make_mesh()
    ds = make_synthetic_dataset(64, h=32, w=64)
    state = create_train_state(SMALL, jax.random.PRNGKey(0))
    state = jax.tree.map(
        lambda x: replicate(mesh, x) if isinstance(x, jax.Array) else x, state
    )
    train_step = jax.jit(make_train_step(SMALL), donate_argnums=0)
    batch = jax.device_put(_batch(ds, np.arange(16)), batch_spec(mesh))
    state2, parts = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(parts["loss"]))
    # Params stay replicated after the update.
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_full_train_loop_tiny(tmp_path):
    from cilrs_tpu.train.loop import train

    ds = make_synthetic_dataset(96, h=32, w=64)
    cfg = dataclasses.replace(
        SMALL, training=TrainingConfig(batch_size=16, epochs=2, early_stop_patience=6)
    )
    out = train(ds, cfg, ckpt_dir=str(tmp_path / "run"), steps_per_epoch=3, verbose=False)
    assert len(out["history"]) == 2
    assert np.isfinite(out["best_val_loss"])
    assert os.path.exists(tmp_path / "run" / "training_history.csv")
    # Resume continues from epoch 2.
    cfg3 = dataclasses.replace(
        cfg, training=TrainingConfig(batch_size=16, epochs=3, early_stop_patience=6)
    )
    out2 = train(ds, cfg3, ckpt_dir=str(tmp_path / "run"), resume=True,
                 steps_per_epoch=3, verbose=False)
    assert out2["history"][0]["epoch"] == 3
