"""Pallas TPU kernel: fused ground classification for the rasterizer.

The renderer's hottest loop classifies every ground-hit pixel against the K
lane segments culled around the ego (road / dashed-marking / sidewalk masks).
This kernel keeps the whole [K, TILE_N] working set in VMEM and emits the three
masks in one pass.

Layout (TPU-native): pixels on the LANE axis (TILE_N = 512, a multiple of 128),
segments on the SUBLANE axis (K_PAD = 128). Per-segment scalars are broadcast
as [K, 1] columns; all intermediates are 2-D [K_PAD, TILE_N] bf16 tiles.

`ground_masks_pallas` matches `raster._ground_masks` (same bf16 policy) and is
equivalence-tested in tests/test_pallas.py via interpret mode on CPU.

Status: compiles and runs on v5e (CILRS_PALLAS=1), but the XLA fusion of the
same math is currently FASTER end-to-end (14.9k vs 10.8k env-steps/s at E=256):
the kernel pays a host-side pad+transpose of the pixel array plus K_PAD=128
compute vs the culled K=96, while XLA fuses the masks straight into the
renderer's select chain. Kept as the starting point for a future fully-fused
renderer kernel; the XLA path stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cilrs_tpu.maps.network import RoadNetwork

K_PAD = 128  # segment sublane padding
TILE_N = 512  # pixels per grid step (lane axis)

ROAD_HALF_W = 2.2
SIDEWALK_OUT = 4.2
MARKING_LAT = 1.75
MARKING_HALF_W = 0.22


def _kernel(g_ref, seg_ref, out_ref):
    """One pixel tile vs all segments.

    g:   [2, TILE_N] f32 — rows: gx, gy (ego-centered ground hits).
    seg: [K_PAD, 8] f32 — columns: ax, ay, dirx, diry, len, markable, valid, pad
         (column-major so per-segment vectors are SLICES, not gathers — Mosaic
         cannot lower integer-index gathers).
    out: [3, TILE_N] f32 — rows: road, marking, sidewalk.
    """
    bf = jnp.bfloat16
    f32 = jnp.float32
    gx = g_ref[0:1, :].astype(bf)  # [1, T]
    gy = g_ref[1:2, :].astype(bf)
    seg = seg_ref[:].astype(bf)  # [K, 8]
    ax = seg[:, 0:1]  # [K, 1]
    ay = seg[:, 1:2]
    dx = seg[:, 2:3]
    dy = seg[:, 3:4]
    ln = seg[:, 4:5]
    # Comparison operands stay f32: this target's Mosaic rejects bf16 compares.
    markable32 = seg_ref[:, 5:6]
    valid32 = seg_ref[:, 6:7]

    relx = gx - ax  # [K, T] — arithmetic in bf16 (2x VPU throughput)
    rely = gy - ay
    s = relx * dx + rely * dy
    t = jnp.clip(s, 0.0, ln)
    lat = rely * dx - relx * dy
    ox = relx - t * dx
    oy = rely - t * dy
    d2 = (ox * ox + oy * oy).astype(f32)
    d2 = jnp.where(valid32 > 0, d2, f32(1e9))

    dmin = jnp.sqrt(jnp.min(d2, axis=0, keepdims=True))  # [1, T]
    road = (dmin < ROAD_HALF_W).astype(f32)
    sidewalk = ((dmin >= ROAD_HALF_W) & (dmin < SIDEWALK_OUT)).astype(f32)
    s32 = s.astype(f32)
    on_mark = (
        (jnp.abs(lat.astype(f32) - MARKING_LAT) < MARKING_HALF_W)
        & (s32 > 0) & (s32 < ln.astype(f32)) & (markable32 > 0)
    )
    marking = jnp.max(on_mark.astype(f32), axis=0, keepdims=True) * road

    out_ref[0:1, :] = road
    out_ref[1:2, :] = marking
    out_ref[2:3, :] = sidewalk


@functools.partial(jax.jit, static_argnames=("interpret",))
def ground_masks_pallas(
    seg: jnp.ndarray,  # [K_PAD, 8] packed segment table (see pack_segments)
    gxy_centered: jnp.ndarray,  # [N, 2] f32, ego-centered ground hits
    interpret: bool = False,
):
    """Returns (road, marking, sidewalk) float32 masks of shape [N]."""
    N = gxy_centered.shape[0]
    n_pad = (-N) % TILE_N
    g = jnp.pad(gxy_centered, ((0, n_pad), (0, 0))).T  # [2, N_pad]
    grid = (g.shape[1] // TILE_N,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, g.shape[1]), jnp.float32),
        interpret=interpret,
    )(g, seg)
    return out[0, :N], out[1, :N], out[2, :N]


def pack_segments(net: RoadNetwork, ego_pos: jnp.ndarray, k_cull: int = 96) -> jnp.ndarray:
    """Cull the k segments nearest the ego and pack the [K_PAD, 8] table
    (ego-centered endpoints, unit direction, length, markable flag, valid)."""
    d2 = jnp.sum((net.wp_xy - ego_pos) ** 2, axis=-1)
    _, idx = jax.lax.top_k(-d2, k_cull)
    a = net.wp_xy[idx] - ego_pos
    b = net.wp_xy[net.wp_next[idx, 0]] - ego_pos
    ab = b - a
    seg_len = jnp.sqrt(jnp.sum(ab * ab, axis=-1) + 1e-9)
    dirn = ab / seg_len[:, None]
    markable = (((idx % 3) != 2) & ~net.wp_is_junction[idx]).astype(jnp.float32)

    pad = K_PAD - k_cull
    row = lambda x: jnp.pad(x.astype(jnp.float32), (0, pad))
    return jnp.stack([
        row(a[:, 0]), row(a[:, 1]), row(dirn[:, 0]), row(dirn[:, 1]),
        row(seg_len), row(markable),
        jnp.pad(jnp.ones(k_cull, jnp.float32), (0, pad)),  # valid
        jnp.zeros(K_PAD, jnp.float32),
    ], axis=1)
