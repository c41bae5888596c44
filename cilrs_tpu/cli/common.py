"""Shared CLI helpers: map construction, model loading."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cilrs_tpu.config import TrainConfig
from cilrs_tpu.maps.network import RoadNetwork
from cilrs_tpu.maps.town import make_mini_town, make_town01


def build_map(spec: str) -> RoadNetwork:
    """--map town01 (default) | mini | osm:<path.osm>"""
    if spec in ("town01", "Town01", ""):
        return make_town01()
    if spec == "mini":
        return make_mini_town()
    if spec.startswith("osm:"):
        from cilrs_tpu.maps.osm import load_osm_network

        return load_osm_network(spec[4:])
    raise SystemExit(f"unknown --map {spec!r} (use town01 | mini | osm:<path>)")


def load_policy(checkpoint: str | None, cfg: TrainConfig | None = None):
    """Returns (policy_fn, train_state). Random init + warning if no checkpoint
    (the reference requires --checkpoint; we allow smoke runs without one)."""
    from cilrs_tpu.train.checkpoint import restore_best_params
    from cilrs_tpu.train.state import create_train_state

    cfg = cfg or TrainConfig()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    if checkpoint:
        state = restore_best_params(checkpoint, state)
        print(f"  loaded checkpoint: {checkpoint}")
    else:
        print("  WARNING: no --checkpoint given; driving with an untrained policy")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = state.apply_fn

    def policy_fn(image, speed_norm, command):
        controls, _ = apply_fn(variables, image, speed_norm, command, train=False)
        return controls

    return policy_fn, state
