"""Fused on-device collect+train loop (tiny CPU configuration)."""

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.config import ModelConfig, TrainConfig, TrainingConfig
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.train.fused import (
    fused_collect_train, make_buffer, sample_batch, write_chunk,
)

TINY_CAM = CameraSpec(width=64, height=32)
TINY_CFG = TrainConfig(
    model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                      stage_sizes=(1, 1, 1, 1)),
    training=TrainingConfig(batch_size=16),
)


def test_ring_buffer_semantics():
    buf = make_buffer(32, 4, 4)
    frames = jnp.arange(20 * 4 * 4 * 3, dtype=jnp.uint8).reshape(20, 4, 4, 3)
    buf = write_chunk(
        buf, frames, jnp.full((20,), 10.0), jnp.zeros((20,), jnp.int32),
        jnp.zeros((20, 3)), jnp.ones((20,), bool),
    )
    assert int(buf.cursor) == 20
    assert int(buf.total_written) == 20
    assert bool(buf.valid[:20].all()) and not bool(buf.valid[20:].any())
    # Wrap-around write.
    buf = write_chunk(
        buf, frames, jnp.full((20,), 0.1), jnp.ones((20,), jnp.int32),
        jnp.zeros((20, 3)), jnp.zeros((20,), bool),  # stationary -> invalid
    )
    assert int(buf.cursor) == 8  # (20+20) % 32
    assert int(buf.total_written) == 20  # stationary not counted
    assert not bool(buf.valid[0])  # overwritten as invalid


def test_sample_batch_weights():
    buf = make_buffer(64, 4, 4)
    cmd = jnp.asarray(np.array([0] * 50 + [1] * 14), jnp.int32)
    buf = write_chunk(
        buf, jnp.zeros((64, 4, 4, 3), jnp.uint8), jnp.full((64,), 10.0),
        cmd, jnp.zeros((64, 3)), jnp.ones((64,), bool),
    )
    batch = sample_batch(buf, jax.random.PRNGKey(0), 32)
    w = np.asarray(batch["weights"])
    c = np.asarray(batch["command"])
    assert np.isfinite(w).all()
    # Rare command gets larger weight than the common one.
    if (c == 0).any() and (c == 1).any():
        assert w[c == 1].mean() > w[c == 0].mean()


def test_fused_loop_runs(mini_town):
    out = fused_collect_train(
        mini_town, TINY_CFG, num_envs=2, num_vehicles=3, num_pedestrians=1,
        buffer_frames=512, collect_ticks=10, train_steps_per_chunk=2,
        total_train_steps=8, warmup_chunks=4, seed=0, cam=TINY_CAM,
        eval_every=4, verbose=False,
    )
    assert out["frames_collected"] > 20
    assert out["train_steps"] == 8
    assert len(out["history"]) >= 1
    assert np.isfinite(out["history"][-1]["val_loss"])
