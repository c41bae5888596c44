"""Orbax checkpointing with real resume.

The reference saves checkpoint_best.pth / checkpoint_latest.pth every epoch
(notebook PART D: model + optimizer state, epoch, val_loss, config, per-command
errors) but never implements resume (SURVEY.md §5 checkpoint/resume). Here
`save_checkpoint`/`restore_latest` round-trip the full train state including the
optimizer and schedule step, so training continues exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from cilrs_tpu.train.state import CILRSTrainState

BEST_NAME = "best"
LATEST_NAME = "latest"


BEST_SUBDIR = "best_ckpt"


def _mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def _best_mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    """Dedicated single-slot manager for the best checkpoint: the rolling
    max_to_keep=3 window in the main manager would otherwise garbage-collect
    the best epoch long before an early stop (patience 6) fires."""
    return ocp.CheckpointManager(
        os.path.join(os.path.abspath(ckpt_dir), BEST_SUBDIR),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
    )


def save_checkpoint(
    ckpt_dir: str,
    state: CILRSTrainState,
    epoch: int,
    val_loss: float,
    extra: dict[str, Any] | None = None,
    is_best: bool = False,
    latest: bool = True,
):
    """Save to the rolling `latest` slot (when `latest`) and/or the dedicated
    best slot (when `is_best`). Callers on a tunneled single chip should
    throttle `latest` (train/loop.py saves it every ckpt_every epochs): each
    slot write is a full ~270 MB train-state device_get, ~45 s at the
    tunnel's measured 5.8 MB/s — saving both slots every epoch was a large
    fraction of r2's 214 s epoch time (VERDICT r2 item 5)."""
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    meta = {
        "epoch": epoch,
        "val_loss": float(val_loss),
        # Architecture flag recorded so restorers can build the right model.
        "speed_skip": "speed_skip_w" in (state.params.get("branches") or {}),
        **(extra or {}),
    }
    if latest:
        with _mgr(ckpt_dir) as mgr:
            mgr.save(
                epoch,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(payload),
                    meta=ocp.args.JsonSave(meta),
                ),
            )
            mgr.wait_until_finished()
    if is_best:
        with _best_mgr(ckpt_dir) as bmgr:
            bmgr.save(
                epoch,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(payload),
                    meta=ocp.args.JsonSave(meta),
                ),
            )
            bmgr.wait_until_finished()
        best_path = os.path.join(os.path.abspath(ckpt_dir), "best_epoch.txt")
        with open(best_path, "w") as f:
            f.write(f"{epoch} {val_loss}\n")


def restore_latest(ckpt_dir: str, state: CILRSTrainState):
    """Returns (state, epoch, val_loss) or (state, 0, inf) if nothing saved."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return state, 0, float("inf")
    with _mgr(ckpt_dir) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0, float("inf")
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
    payload, meta = restored["state"], restored["meta"]
    new_state = state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
    )
    return new_state, int(meta["epoch"]), float(meta["val_loss"])


def restore_best_payload(ckpt_dir: str) -> dict:
    """Template-free restore of the best checkpoint's payload dict.

    Prefers the dedicated best_ckpt/ slot; falls back to best_epoch.txt /
    latest step in the rolling manager for checkpoints written before the
    best-slot existed. Template-free so the caller can inspect the saved
    param tree (architecture flags like speed_skip changed across rounds —
    advisor r2) BEFORE constructing the matching model."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    comp = ocp.args.Composite(state=ocp.args.StandardRestore())

    if os.path.isdir(os.path.join(ckpt_dir, BEST_SUBDIR)):
        with _best_mgr(ckpt_dir) as bmgr:
            epoch = bmgr.latest_step()
            if epoch is not None:
                return bmgr.restore(epoch, args=comp)["state"]

    best_path = os.path.join(ckpt_dir, "best_epoch.txt")
    with _mgr(ckpt_dir) as mgr:
        steps = mgr.all_steps()
        if os.path.exists(best_path):
            epoch = int(open(best_path).read().split()[0])
            if epoch not in steps:  # best GC'd by the rolling window
                epoch = max(steps) if steps else None
        else:
            epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return mgr.restore(epoch, args=comp)["state"]


def payload_speed_skip(payload: dict) -> bool:
    """Whether a checkpoint payload was trained with the speed-skip head."""
    return "speed_skip_w" in payload["params"].get("branches", {})


def restore_best_params(ckpt_dir: str, state: CILRSTrainState):
    """Load the best epoch's params for inference (checkpoint_best.pth parity).

    The caller's `state` must have the matching architecture; use
    `restore_best_payload` + `payload_speed_skip` to detect it first."""
    payload = restore_best_payload(ckpt_dir)
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )
