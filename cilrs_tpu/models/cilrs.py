"""CILRS policy: conditional imitation learning with a ResNet-34 trunk.

Capability parity with the reference's CILRS (model/autonomous_drive.py:361-399
and the notebook training copy): 512-d visual feature, 1->128->128 speed encoder,
4 command-conditional control branches (steer, throttle, brake), and an auxiliary
speed head off the visual feature. ~22.4 M parameters.

TPU-first deltas from the torch version:
 - the 4 branches are ONE stacked parameter tensor contracted with einsum and
   selected by a one-hot command mask (dense, MXU-shaped) rather than a Python
   ModuleList loop + gather — same math, one matmul of width 4x256;
 - NHWC bfloat16 activations, float32 params;
 - dropout keys are explicit (pure function), defaulting to eval mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from cilrs_tpu.models.resnet import ResNet34

VISUAL_DIM = 512
SPEED_DIM = 128
COMBINED_DIM = VISUAL_DIM + SPEED_DIM  # 640
BRANCH_HIDDEN = 256
NUM_OUTPUTS = 3  # steer, throttle, brake


class BranchHeads(nn.Module):
    """All command branches evaluated densely, then one-hot selected.

    Equivalent to the reference's stack-all-branches-then-gather
    (model/autonomous_drive.py:395-399) but expressed as stacked weights so XLA
    sees two wide matmuls instead of num_commands small ones.
    """

    num_commands: int = 4
    dropout: float = 0.0
    speed_skip: bool = False

    @nn.compact
    def __call__(self, combined, command, train: bool = False, speed=None):
        K, H, D = self.num_commands, BRANCH_HIDDEN, combined.shape[-1]
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (D, K * H), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (K * H,), jnp.float32)
        w2 = self.param("w2", init, (K, H, H), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (K, H), jnp.float32)
        w3 = self.param("w3", init, (K, H, NUM_OUTPUTS), jnp.float32)
        b3 = self.param("b3", nn.initializers.zeros, (K, NUM_OUTPUTS), jnp.float32)

        x = combined.astype(jnp.bfloat16)
        h1 = (x @ w1.astype(jnp.bfloat16) + b1).reshape(x.shape[0], K, H)
        h1 = nn.relu(h1)
        h1 = nn.Dropout(self.dropout, deterministic=not train)(h1)
        h2 = jnp.einsum("bkh,khj->bkj", h1, w2.astype(jnp.bfloat16)) + b2
        h2 = nn.relu(h2)
        h2 = nn.Dropout(self.dropout, deterministic=not train)(h2)
        out = jnp.einsum("bkh,khj->bkj", h2, w3.astype(jnp.bfloat16)) + b3  # [B, K, 3]
        if self.speed_skip and speed is not None:
            # Direct per-command linear term in normalized speed. The teacher's
            # throttle is a steep exact function of the (exactly known) speed
            # input, but with dropout-regularized deep paths SGD settles into
            # ignoring the scalar (CILRS's classic inertia failure: measured
            # d(throttle)/d(speed) was ~3% of the teacher's law). A linear
            # skip makes the speed law a one-step learning problem.
            w_sk = self.param("speed_skip_w", nn.initializers.zeros,
                              (K, NUM_OUTPUTS), jnp.float32)
            out = out + speed[:, None, None].astype(out.dtype) * w_sk.astype(out.dtype)
        onehot = jnp.eye(K, dtype=out.dtype)[command]  # [B, K]
        return jnp.einsum("bkj,bk->bj", out, onehot).astype(jnp.float32)


class CILRS(nn.Module):
    num_commands: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    # ResNet-34 by default; tests use tiny stage configs for fast CPU compiles.
    stage_sizes: tuple = (3, 4, 6, 3)
    stage_features: tuple = (64, 128, 256, 512)
    # Speed-aware head: dropout-free speed encoder + per-command linear speed
    # skip into the branch outputs (keeps the model from ignoring the speed
    # input). Off for strict reference-checkpoint interop (torch_import).
    speed_skip: bool = True

    @nn.compact
    def __call__(self, image, speed, command, train: bool = False):
        """image [B,H,W,3] normalized; speed [B] normalized; command [B] int.

        Returns (controls [B,3] = steer/throttle/brake raw outputs,
                 pred_speed [B] normalized auxiliary speed).
        """
        visual = ResNet34(
            stage_sizes=self.stage_sizes, stage_features=self.stage_features,
            dtype=self.dtype, name="visual_encoder",
        )(image, train=train)

        s = speed[:, None].astype(jnp.float32)
        s = nn.Dense(SPEED_DIM, name="speed_fc1")(s)
        s = nn.relu(s)
        if not self.speed_skip:  # reference parity: dropout on the speed path
            s = nn.Dropout(self.dropout, deterministic=not train)(s)
        s = nn.Dense(SPEED_DIM, name="speed_fc2")(s)
        s = nn.relu(s)

        combined = jnp.concatenate([visual, s], axis=-1)  # [B, 640]

        p = nn.Dense(BRANCH_HIDDEN, name="speed_pred_fc1")(visual)
        p = nn.relu(p)
        p = nn.Dropout(self.dropout, deterministic=not train)(p)
        p = nn.Dense(BRANCH_HIDDEN, name="speed_pred_fc2")(p)
        p = nn.relu(p)
        pred_speed = nn.Dense(1, name="speed_pred_out")(p)[:, 0]

        controls = BranchHeads(
            num_commands=self.num_commands, dropout=self.dropout,
            speed_skip=self.speed_skip, name="branches",
        )(combined, command, train=train, speed=speed)
        return controls, pred_speed
