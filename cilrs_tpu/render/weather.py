"""Procedural weather shading for the rasterizer.

Implements the five presets the reference benchmarks drive in
(clear / rain / fog / night / hardrain — RESULTS.md:10-18) as a per-weather
parameter table applied in the shader: sky colors, ambient light, fog density,
rain streaks, wet-road darkening, and a night headlight cone. Selected by an
integer weather index inside jit, so one compiled renderer serves all presets
and a batch can mix them.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.config import WEATHER_NAMES

# Per-weather shader parameters, rows ordered like WEATHER_NAMES:
#   clear, rain, fog, night, hardrain
_SKY_TOP = jnp.array([
    [0.45, 0.66, 0.95],
    [0.45, 0.50, 0.58],
    [0.70, 0.72, 0.74],
    [0.02, 0.03, 0.08],
    [0.30, 0.33, 0.38],
], jnp.float32)
_SKY_HORIZON = jnp.array([
    [0.78, 0.86, 0.98],
    [0.60, 0.64, 0.68],
    [0.80, 0.81, 0.82],
    [0.05, 0.06, 0.12],
    [0.42, 0.45, 0.50],
], jnp.float32)
_AMBIENT = jnp.array([1.0, 0.75, 0.85, 0.25, 0.55], jnp.float32)
_FOG_DENSITY = jnp.array([0.002, 0.010, 0.045, 0.012, 0.030], jnp.float32)
_RAIN = jnp.array([0.0, 0.5, 0.0, 0.0, 1.0], jnp.float32)
_WET = jnp.array([0.0, 0.6, 0.1, 0.0, 0.9], jnp.float32)
_NIGHT = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)

assert _SKY_TOP.shape[0] == len(WEATHER_NAMES)


def sky_color(weather_idx: jnp.ndarray, elev01: jnp.ndarray) -> jnp.ndarray:
    """Sky gradient; elev01 in [0,1], 0 = horizon. Returns [..., 3]."""
    top = _SKY_TOP[weather_idx]
    hor = _SKY_HORIZON[weather_idx]
    t = jnp.clip(elev01, 0.0, 1.0)[..., None]
    return hor * (1.0 - t) + top * t


def fog_color(weather_idx: jnp.ndarray) -> jnp.ndarray:
    return _SKY_HORIZON[weather_idx]


def apply_atmosphere(
    weather_idx: jnp.ndarray,
    color: jnp.ndarray,  # [..., 3] surface color
    dist: jnp.ndarray,  # [...] distance to surface, m
) -> jnp.ndarray:
    """Ambient light + exponential fog toward the horizon color."""
    amb = _AMBIENT[weather_idx]
    lit = color * amb
    f = 1.0 - jnp.exp(-_FOG_DENSITY[weather_idx] * dist)
    return lit * (1.0 - f[..., None]) + fog_color(weather_idx) * f[..., None]


def wet_darken(weather_idx: jnp.ndarray, road_color: jnp.ndarray) -> jnp.ndarray:
    wet = _WET[weather_idx]
    return road_color * (1.0 - 0.35 * wet)


def _hash01(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap per-element hash -> [0, 1) float noise."""
    h = jnp.sin(x * 12.9898 + 78.233) * 43758.5453
    return h - jnp.floor(h)


def rain_streaks(
    weather_idx: jnp.ndarray,
    u: jnp.ndarray,  # [H, W] pixel column coords 0..1
    v: jnp.ndarray,  # [H, W] pixel row coords 0..1
    time_s: jnp.ndarray,
    color: jnp.ndarray,  # [H, W, 3]
) -> jnp.ndarray:
    """Overlay falling streaks; intensity from the weather table."""
    strength = _RAIN[weather_idx]
    col = jnp.floor(u * 60.0)
    phase = _hash01(col)
    fall = (v * 2.5 + time_s * 1.7 + phase) % 1.0
    streak = (fall < 0.12) & (_hash01(col + jnp.floor(time_s * 1.7)) > 0.5)
    overlay = jnp.where(streak[..., None], 0.75, 0.0)
    a = 0.35 * strength
    return color * (1.0 - a * (overlay > 0)) + overlay * a


def night_level(weather_idx: jnp.ndarray) -> jnp.ndarray:
    """0..1 darkness factor (1 for the night preset) — taillight gating."""
    return _NIGHT[weather_idx]


def headlight(
    weather_idx: jnp.ndarray,
    u: jnp.ndarray,  # [H, W] 0..1
    v: jnp.ndarray,
    dist: jnp.ndarray,  # [H, W] ground distance
    color: jnp.ndarray,
) -> jnp.ndarray:
    """Night: brighten a cone ahead of the car (lower-center of the image)."""
    night = _NIGHT[weather_idx]
    cone = jnp.exp(-((u - 0.5) ** 2) / 0.03) * jnp.clip((v - 0.45) * 2.2, 0.0, 1.0)
    near = jnp.exp(-dist / 25.0)
    boost = 1.0 + night * 2.6 * cone * near
    return color * boost[..., None]
