"""Jitted train/eval steps with on-device augmentation and DP sharding.

Replaces the notebook's train_one_epoch/validate loops (PART D): forward in
bfloat16, weighted L1+MSE loss, grad clip, Adam — all fused into one XLA program
per step, with the batch sharded over the mesh's data axis and gradients
all-reduced by XLA (no DDP, no NCCL — SURVEY.md §2.2). Augmentation (notebook's
Albumentations stack) runs on device inside the same program.

Per-command steering error tracking (the notebook's cmd_errors block) is
computed densely with one-hot masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cilrs_tpu.config import LossConfig, TrainConfig
from cilrs_tpu.models.losses import cilrs_loss
from cilrs_tpu.ops.image import augment_batch, normalize
from cilrs_tpu.train.state import CILRSTrainState


def _prep_images(images_u8: jnp.ndarray, key: jnp.ndarray | None, augment: bool):
    x = images_u8.astype(jnp.float32) / 255.0
    if augment:
        x = augment_batch(key, x)
    return normalize(x)


def make_train_step(cfg: TrainConfig):
    loss_cfg = cfg.loss
    if (cfg.training.speed_loss_boost != 1.0
            or cfg.training.brake_loss_boost != 1.0):
        # Train-time-only reweighting of the aux speed / brake heads; eval
        # keeps the canonical weights so val_loss stays comparable across runs.
        import dataclasses

        loss_cfg = dataclasses.replace(
            loss_cfg,
            speed_weight=loss_cfg.speed_weight * cfg.training.speed_loss_boost,
            brake_weight=loss_cfg.brake_weight * cfg.training.brake_loss_boost,
        )

    def train_step(state: CILRSTrainState, batch: dict, rng: jnp.ndarray):
        """batch: images [B,H,W,3] uint8, speed [B], command [B], controls [B,3]."""
        aug_key, drop_key = jax.random.split(jax.random.fold_in(rng, state.step))
        x = _prep_images(batch["images"], aug_key, augment=True)

        def loss_fn(params):
            (controls, pred_speed), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, batch["speed"], batch["command"], train=True,
                rngs={"dropout": drop_key},
                mutable=["batch_stats"],
            )
            total, parts = cilrs_loss(
                controls, pred_speed, batch["controls"], batch["speed"], loss_cfg
            )
            return total, (parts, mutated["batch_stats"])

        (loss, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, parts

    return train_step


def make_eval_step(cfg: TrainConfig):
    loss_cfg = cfg.loss

    def eval_step(state: CILRSTrainState, batch: dict):
        """Returns loss parts + per-command |steer error| sums and counts."""
        x = _prep_images(batch["images"], None, augment=False)
        controls, pred_speed = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, batch["speed"], batch["command"], train=False,
        )
        total, parts = cilrs_loss(
            controls, pred_speed, batch["controls"], batch["speed"], loss_cfg
        )
        steer_err = jnp.abs(controls[:, 0] - batch["controls"][:, 0])
        onehot = jax.nn.one_hot(batch["command"], 4, dtype=jnp.float32)
        parts = dict(parts)
        parts["cmd_steer_err_sum"] = onehot.T @ steer_err  # [4]
        parts["cmd_count"] = jnp.sum(onehot, axis=0)  # [4]
        parts["pred"] = jnp.concatenate([controls, pred_speed[:, None]], axis=1)
        return parts

    return eval_step
