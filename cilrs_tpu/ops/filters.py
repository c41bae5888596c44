"""Temporal control smoothing as fixed-size ring buffers (pure functions).

Reproduces the reference's smoothing (model/autonomous_drive.py:925-938):
 - steering: 5-frame weighted moving average, weights [0.1, 0.15, 0.2, 0.25, 0.3]
   (recency-biased), normalized over however many frames are present;
 - throttle: plain mean over the last 5 frames (the code uses maxlen=5 even
   though the README says 3 — code wins, SURVEY.md §2.3 item 5).

State is a small pytree so it vmaps over env batches and threads through
`lax.scan` rollouts.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

STEER_WEIGHTS = jnp.array([0.1, 0.15, 0.2, 0.25, 0.3], jnp.float32)
WINDOW = 5


@struct.dataclass
class SmoothingState:
    steer_buf: jnp.ndarray  # [5] oldest..newest
    throttle_buf: jnp.ndarray  # [5]
    count: jnp.ndarray  # scalar i32 — frames seen (saturates at 5)


def init_smoothing() -> SmoothingState:
    return SmoothingState(
        steer_buf=jnp.zeros(WINDOW, jnp.float32),
        throttle_buf=jnp.zeros(WINDOW, jnp.float32),
        count=jnp.asarray(0, jnp.int32),
    )


def reset_smoothing(state: SmoothingState) -> SmoothingState:
    """Clear histories (the reference clears its deques on teleport,
    model/autonomous_drive.py:1407-1417)."""
    return init_smoothing()


def smooth_controls(state: SmoothingState, steer: jnp.ndarray, throttle: jnp.ndarray):
    """Push raw (steer, throttle); return (state', smoothed steer, smoothed throttle)."""
    steer_buf = jnp.concatenate([state.steer_buf[1:], steer[None]])
    throttle_buf = jnp.concatenate([state.throttle_buf[1:], throttle[None]])
    count = jnp.minimum(state.count + 1, WINDOW)

    # Active-slot mask: newest `count` entries of the buffer.
    slot = jnp.arange(WINDOW)
    active = slot >= (WINDOW - count)

    w = jnp.where(active, STEER_WEIGHTS, 0.0)
    sm_steer = jnp.sum(steer_buf * w) / jnp.maximum(jnp.sum(w), 1e-6)

    m = active.astype(jnp.float32)
    sm_throttle = jnp.sum(throttle_buf * m) / jnp.maximum(jnp.sum(m), 1.0)

    return SmoothingState(steer_buf=steer_buf, throttle_buf=throttle_buf, count=count), sm_steer, sm_throttle
