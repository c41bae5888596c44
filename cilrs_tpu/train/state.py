"""Train state: params, batch stats, optimizer — with reference-parity optics.

Optimizer parity with the notebook (PART C, which overrides the stale config —
SURVEY.md §2.3 item 3): Adam lr 1e-4 with L2 weight decay 1e-4 applied to the
gradient (torch-Adam style, i.e. coupled decay BEFORE the Adam moments),
global-norm gradient clipping at 1.0, and a StepLR schedule halving the lr
every 8 epochs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cilrs_tpu.config import OptimizerConfig, TrainConfig
from cilrs_tpu.models.cilrs import CILRS


@struct.dataclass
class CILRSTrainState:
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def step_lr(cfg: OptimizerConfig, steps_per_epoch: int) -> optax.Schedule:
    """StepLR(step_size=8 epochs, gamma=0.5) as a step-indexed schedule."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        k = epoch // cfg.lr_step_epochs
        return cfg.learning_rate * (cfg.lr_step_gamma ** k)

    return schedule


def make_optimizer(
    cfg: OptimizerConfig,
    steps_per_epoch: int,
    schedule: str = "step",
    total_steps: int | None = None,
) -> optax.GradientTransformation:
    """`schedule`: "step" = notebook StepLR parity; "cosine" = warmup+cosine to
    ~0, the better fit for the fused streaming loop where the final-checkpoint
    quality (not per-epoch parity) is what matters."""
    if schedule == "cosine":
        assert total_steps is not None
        warmup = min(max(total_steps // 50, 10), max(total_steps // 2, 1))
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate * 0.05,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=cfg.learning_rate * 0.01,
        )
    else:
        sched = step_lr(cfg, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip),
        optax.add_decayed_weights(cfg.weight_decay),  # torch-Adam coupled L2
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(sched),
    )


def create_train_state(
    cfg: TrainConfig,
    rng: jnp.ndarray,
    steps_per_epoch: int = 1000,
    schedule: str = "step",
    total_steps: int | None = None,
) -> CILRSTrainState:
    model = CILRS(num_commands=cfg.model.num_commands, dropout=cfg.model.dropout,
                  stage_sizes=tuple(cfg.model.stage_sizes),
                  speed_skip=cfg.model.speed_skip)
    H, W = cfg.model.image_height, cfg.model.image_width
    variables = model.init(
        rng,
        jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        train=False,
    )
    tx = make_optimizer(cfg.optimizer, steps_per_epoch, schedule=schedule,
                        total_steps=total_steps)
    return CILRSTrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
