"""CILRS training loss.

Matches the notebook's CILRSLoss (reference notebook.ipynb PART C, which wins
over the stale configs/train_config.json per SURVEY.md §2.3):
    5 * L1(steer) + 1 * L1(throttle) + 1 * L1(brake) + 0.5 * MSE(pred_speed).
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.config import LossConfig


def cilrs_loss(
    controls_pred: jnp.ndarray,  # [B, 3]
    speed_pred: jnp.ndarray,  # [B] normalized
    controls_true: jnp.ndarray,  # [B, 3]
    speed_true: jnp.ndarray,  # [B] normalized
    cfg: LossConfig = LossConfig(),
):
    """Returns (total_loss, dict of component losses)."""
    l1 = jnp.abs(controls_pred - controls_true)
    steer_l = jnp.mean(l1[:, 0])
    throttle_l = jnp.mean(l1[:, 1])
    brake_l = jnp.mean(l1[:, 2])
    speed_l = jnp.mean((speed_pred - speed_true) ** 2)
    total = (cfg.steer_weight * steer_l + cfg.throttle_weight * throttle_l
             + cfg.brake_weight * brake_l + cfg.speed_weight * speed_l)
    return total, {
        "loss": total,
        "steer_l1": steer_l,
        "throttle_l1": throttle_l,
        "brake_l1": brake_l,
        "speed_mse": speed_l,
    }
