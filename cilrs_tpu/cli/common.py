"""Shared CLI helpers: compilation cache, map construction, model loading."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cilrs_tpu.config import TrainConfig
from cilrs_tpu.maps.network import RoadNetwork
from cilrs_tpu.maps.town import make_mini_town, make_town01


def require_accelerator(allow_cpu_env: str = "CILRS_ALLOW_CPU") -> None:
    """Fail fast when a TPU-expected entry point silently lands on XLA:CPU.

    The tunneled-TPU (axon) plugin registers from a sitecustomize on
    PYTHONPATH; any wrapper that overrides PYTHONPATH (or clears
    JAX_PLATFORMS) silently drops the process to CPU, where the fused
    env-step runs ~1000x slower — a failure mode that has burned real
    sessions by masquerading as a perf regression. Set CILRS_ALLOW_CPU=1
    for deliberate CPU runs (tests set JAX_PLATFORMS=cpu explicitly and
    never call this)."""
    if os.environ.get(allow_cpu_env) or os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    if jax.default_backend() == "cpu":
        raise SystemExit(
            "cilrs_tpu: default JAX backend is CPU but this entry point expects "
            "an accelerator. If the machine tunnels a TPU via an axon "
            "sitecustomize, keep its dir on PYTHONPATH (e.g. "
            "PYTHONPATH=/root/.axon_site:... JAX_PLATFORMS=axon). "
            "Set CILRS_ALLOW_CPU=1 to run on CPU anyway.")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: the render+policy+dynamics megakernel
    costs ~160 s to compile cold (BENCH_r01); warm runs skip it entirely.
    Called by every CLI entry point and bench.py before any jit."""
    cache_dir = cache_dir or os.environ.get(
        "CILRS_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


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
    """Returns (apply_fn, variables).

    IMPORTANT: callers must pass `variables` as a traced jit ARGUMENT and build
    the per-call policy closure inside the jitted function — closing over the
    22 M-param pytree turns it into 90 MB of jaxpr constants, which cripples
    (remote) compilation.

    Accepts Orbax checkpoint dirs or reference torch .pth files
    (checkpoint_best.pth interop via models.torch_import).
    """
    from cilrs_tpu.train.checkpoint import payload_speed_skip, restore_best_payload
    from cilrs_tpu.train.state import create_train_state

    cfg = cfg or TrainConfig()
    if checkpoint and checkpoint.endswith((".pth", ".pt")):
        from cilrs_tpu.models.cilrs import CILRS
        from cilrs_tpu.models.torch_import import load_reference_checkpoint

        variables = load_reference_checkpoint(checkpoint)
        print(f"  loaded torch checkpoint: {checkpoint}")
        # Reference checkpoints have no speed-skip parameters: drive them
        # through the exact reference architecture.
        parity = CILRS(num_commands=cfg.model.num_commands, dropout=0.0,
                       stage_sizes=tuple(cfg.model.stage_sizes),
                       speed_skip=False)
        return parity.apply, variables
    if checkpoint:
        # Detect the checkpoint's architecture (speed_skip changed the param
        # tree across rounds) and build the MATCHING model — a default-config
        # template would fail to restore legacy checkpoints (advisor r2).
        payload = restore_best_payload(checkpoint)
        ss = payload_speed_skip(payload)
        if ss != cfg.model.speed_skip:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, speed_skip=ss))
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        state = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"])
        print(f"  loaded checkpoint: {checkpoint} (speed_skip={ss})")
    else:
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        print("  WARNING: no --checkpoint given; driving with an untrained policy")
    return state.apply_fn, {"params": state.params, "batch_stats": state.batch_stats}
