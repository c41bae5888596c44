"""Config system: dataclasses loaded from ``configs/*.json``.

The reference ships ``configs/train_config.json`` and ``configs/weather_config.json``
but never reads them (no script opens ``configs/``; all constants are inlined, e.g.
reference ``model/autonomous_drive.py:945-948``, ``model/collect_data.py:53-58``).
Here the config system is real: the weather profiles drive the controller, and the
training config drives the optimizer. Where the reference's config JSON contradicts
its code (speed normalization 40 vs 90, MSE vs L1 loss, lr 2e-4 vs 1e-4 — see
SURVEY.md §2.3) we follow the *code* values.

Weather profiles additionally become a device-side ``WeatherTable`` — a pytree of
``[num_weathers]``-shaped arrays indexed by an integer ``weather_idx`` inside jit,
so one compiled program serves all five presets (and a batch can mix them).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax.numpy as jnp
from flax import struct

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

WEATHER_NAMES = ("clear", "rain", "fog", "night", "hardrain")
COMMAND_NAMES = ("LANEFOLLOW", "LEFT", "RIGHT", "STRAIGHT")

# Speed normalization factor (reference autonomous_drive.py:485, collect_data.py:675).
SPEED_NORM_FACTOR = 90.0


def _load_json(name: str, override_path: str | None = None) -> dict[str, Any]:
    path = override_path or os.path.join(_CONFIG_DIR, name)
    with open(path) as f:
        return json.load(f)


@struct.dataclass
class WeatherTable:
    """Per-weather controller parameters as stacked arrays ([W] each).

    Implements the documented-but-dead weather capability of the reference
    (``configs/weather_config.json``, README "weather-adaptive driving") as real,
    jit-indexable data.
    """

    max_speed_kmh: jnp.ndarray
    curve_speed_kmh: jnp.ndarray
    sharp_curve_speed_kmh: jnp.ndarray
    brake_factor: jnp.ndarray
    steer_damping: jnp.ndarray
    curve_lookahead: jnp.ndarray
    curve_threshold: jnp.ndarray
    sharp_threshold: jnp.ndarray
    traction_control: jnp.ndarray
    traction_speed_threshold_kmh: jnp.ndarray
    friction: jnp.ndarray

    @property
    def num_weathers(self) -> int:
        return self.max_speed_kmh.shape[0]


@dataclasses.dataclass(frozen=True)
class ObstacleConfig:
    lateral_threshold_m: float = 2.5
    forward_dot_threshold: float = 0.5
    max_detection_range_m: float = 20.0
    min_detection_range_m: float = 0.5
    actor_cache_refresh_frames: int = 5
    actor_cache_radius_m: float = 25.0


@dataclasses.dataclass(frozen=True)
class TrafficLightConfig:
    max_obey_distance_m: float = 15.0
    heading_dot_threshold: float = 0.3


@dataclasses.dataclass(frozen=True)
class ScoringConfig:
    collision_penalty: float = 15.0
    red_light_violation_penalty: float = 10.0
    off_road_penalty_factor: float = 40.0
    safety_weight: float = 0.6
    comfort_weight: float = 0.3
    route_completion_weight: float = 0.1
    comfort_jerk_factor: float = 1000.0
    grades: tuple = (("A+", 90.0), ("A", 80.0), ("B+", 70.0), ("B", 60.0))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    backbone: str = "resnet34"
    num_commands: int = 4
    dropout: float = 0.5
    image_height: int = 88
    image_width: int = 200
    speed_normalization: float = SPEED_NORM_FACTOR
    # ResNet stage depths; (1, 1, 1, 1) gives a fast "resnet10" for tests.
    stage_sizes: tuple = (3, 4, 6, 3)
    # Speed-aware head (dropout-free speed encoder + per-command linear speed
    # skip). False reproduces the reference architecture exactly.
    speed_skip: bool = True


@dataclasses.dataclass(frozen=True)
class LossConfig:
    steer_weight: float = 5.0
    throttle_weight: float = 1.0
    brake_weight: float = 1.0
    speed_weight: float = 0.5


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "adam"
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    gradient_clip: float = 1.0
    lr_step_epochs: int = 8
    lr_step_gamma: float = 0.5


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    batch_size: int = 120
    epochs: int = 20
    val_fraction: float = 0.15
    early_stop_patience: int = 6
    seed: int = 42
    compute_dtype: str = "bfloat16"
    # Extra sampling weight on big-steer/braking frames (0 = reference parity,
    # command-frequency weighting only). See data.dataset.command_weights.
    hard_frame_boost: float = 0.0
    # Evaluate/deploy a Polyak average of the params instead of the raw
    # iterate (the fused loop measured it both steadier and better; the best
    # checkpoint slot then holds the averaged params, the latest slot keeps
    # the raw resume state).
    ema_eval: bool = True
    # TRAIN-only multiplier on the aux speed-head MSE weight (the reported
    # train/val loss keeps the canonical notebook weights, LossConfig). The
    # speed head reads visual features only (CILRS aux task); at the 0.5
    # canonical weight its gradient is ~1% of the total, and the trunk never
    # learns to fully exploit the motion-blur/grain-stretch speed cues
    # (speed corr plateaued at 0.957 vs the reference's 0.9844).
    speed_loss_boost: float = 1.0
    # TRAIN-only multiplier on the brake-head L1 weight (same pattern as
    # speed_loss_boost — reported losses keep canonical weights). Brake
    # events are ~10% of frames and binary-ish; at the canonical 1.0 weight
    # the brake head plateaued at corr 0.963 vs the reference's 0.9815
    # (round-2 ceiling measurement: 0.9974 reachable, tools/corr_ceiling.py).
    brake_loss_boost: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    training: TrainingConfig = TrainingConfig()


def _sub(cls, d: dict[str, Any]):
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})


def load_train_config(path: str | None = None) -> TrainConfig:
    raw = _load_json("train.json", path)
    return TrainConfig(
        model=_sub(ModelConfig, raw.get("model", {})),
        loss=_sub(LossConfig, raw.get("loss", {})),
        optimizer=_sub(OptimizerConfig, raw.get("optimizer", {})),
        training=_sub(TrainingConfig, raw.get("training", {})),
    )


def load_weather_config(path: str | None = None) -> dict[str, Any]:
    return _load_json("weather.json", path)


def load_weather_table(path: str | None = None) -> WeatherTable:
    raw = load_weather_config(path)["weather_profiles"]
    missing = [w for w in WEATHER_NAMES if w not in raw]
    if missing:
        raise ValueError(f"weather config missing profiles: {missing}")

    def col(field: str, as_bool: bool = False) -> jnp.ndarray:
        vals = [raw[w][field] for w in WEATHER_NAMES]
        if as_bool:
            return jnp.array([1.0 if v else 0.0 for v in vals], dtype=jnp.float32)
        return jnp.array(vals, dtype=jnp.float32)

    return WeatherTable(
        max_speed_kmh=col("max_speed_kmh"),
        curve_speed_kmh=col("curve_speed_kmh"),
        sharp_curve_speed_kmh=col("sharp_curve_speed_kmh"),
        brake_factor=col("brake_factor"),
        steer_damping=col("steer_damping"),
        curve_lookahead=col("curve_lookahead"),
        curve_threshold=col("curve_threshold"),
        sharp_threshold=col("sharp_threshold"),
        traction_control=col("traction_control", as_bool=True),
        traction_speed_threshold_kmh=col("traction_speed_threshold_kmh"),
        friction=col("friction"),
    )


def load_obstacle_config(path: str | None = None) -> ObstacleConfig:
    return _sub(ObstacleConfig, load_weather_config(path).get("obstacle_detection", {}))


def load_traffic_light_config(path: str | None = None) -> TrafficLightConfig:
    return _sub(TrafficLightConfig, load_weather_config(path).get("traffic_light", {}))


def load_scoring_config(path: str | None = None) -> ScoringConfig:
    raw = load_weather_config(path).get("scoring", {})
    grades = raw.pop("grades", None)
    cfg = _sub(ScoringConfig, raw)
    if grades:
        cfg = dataclasses.replace(
            cfg, grades=tuple(sorted(grades.items(), key=lambda kv: -kv[1]))
        )
    return cfg


def weather_index(name: str) -> int:
    name = name.lower().replace("_", "").replace("-", "")
    aliases = {"hardrain": "hardrain", "hard": "hardrain", "clearnoon": "clear"}
    name = aliases.get(name, name)
    if name not in WEATHER_NAMES:
        raise ValueError(f"unknown weather {name!r}; expected one of {WEATHER_NAMES}")
    return WEATHER_NAMES.index(name)
