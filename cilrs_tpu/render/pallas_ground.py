"""Pallas TPU kernel: fused ground classification for the rasterizer.

The renderer's hottest loop classifies every ground-hit pixel against the K
lane segments culled around the ego (road / dashed-marking / sidewalk masks).
The XLA lowering materializes several [N, K] intermediates between fusions;
this kernel keeps the whole [TILE_N, K] working set in VMEM and emits the three
masks in one pass.

Layout: pixels tile the sublane axis (TILE_N rows), segments live on the lane
axis (K padded to 128). Per-segment data is tiny and broadcast from VMEM.

`ground_masks_pallas` is numerically equivalent (same bf16 policy) to
`raster._ground_masks`'s math and is exercised against it in
tests/test_pallas.py via interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cilrs_tpu.maps.network import RoadNetwork

K_PAD = 128  # segment lane padding (VPU lane width)
TILE_N = 512  # pixels per grid step (sublane axis)

ROAD_HALF_W = 2.2
SIDEWALK_OUT = 4.2
MARKING_LAT = 1.75
MARKING_HALF_W = 0.22


def _kernel(gx_ref, gy_ref, seg_ref, out_ref):
    """One pixel tile vs all segments.

    gx/gy: [TILE_N, 1] f32 ego-centered ground hits.
    seg:   [8, K_PAD] f32 rows: ax, ay, dirx, diry, len, markable, valid, pad.
    out:   [TILE_N, 3] f32 road/marking/sidewalk masks.
    """
    bf = jnp.bfloat16
    gx = gx_ref[:].astype(bf)  # [T,1]
    gy = gy_ref[:].astype(bf)
    ax = seg_ref[0, :].astype(bf)  # [K]
    ay = seg_ref[1, :].astype(bf)
    dx = seg_ref[2, :].astype(bf)
    dy = seg_ref[3, :].astype(bf)
    ln = seg_ref[4, :].astype(bf)
    markable = seg_ref[5, :].astype(bf)  # 1.0 = dash-on, non-junction
    valid = seg_ref[6, :].astype(bf)  # 0.0 on lane padding

    relx = gx - ax  # [T,K]
    rely = gy - ay
    s = relx * dx + rely * dy
    t = jnp.clip(s, 0.0, ln)
    lat = rely * dx - relx * dy
    ox = relx - t * dx
    oy = rely - t * dy
    d2 = ox * ox + oy * oy
    d2 = jnp.where(valid > 0, d2, bf(1e9))

    dmin = jnp.sqrt(jnp.min(d2, axis=1, keepdims=True).astype(jnp.float32))  # [T,1]
    road = (dmin < ROAD_HALF_W).astype(jnp.float32)
    sidewalk = ((dmin >= ROAD_HALF_W) & (dmin < SIDEWALK_OUT)).astype(jnp.float32)
    on_mark = (
        (jnp.abs(lat - bf(MARKING_LAT)) < bf(MARKING_HALF_W))
        & (s > 0) & (s < ln) & (markable > 0)
    )
    marking = jnp.max(on_mark.astype(jnp.float32), axis=1, keepdims=True) * road

    out_ref[:, 0:1] = road
    out_ref[:, 1:2] = marking
    out_ref[:, 2:3] = sidewalk


@functools.partial(jax.jit, static_argnames=("interpret",))
def ground_masks_pallas(
    seg: jnp.ndarray,  # [8, K_PAD] packed segment table (see pack_segments)
    gxy_centered: jnp.ndarray,  # [N, 2] f32, ego-centered ground hits
    interpret: bool = False,
):
    """Returns (road, marking, sidewalk) float32 masks of shape [N]."""
    N = gxy_centered.shape[0]
    n_pad = (-N) % TILE_N
    gx = jnp.pad(gxy_centered[:, 0], (0, n_pad)).reshape(-1, 1)
    gy = jnp.pad(gxy_centered[:, 1], (0, n_pad)).reshape(-1, 1)
    grid = (gx.shape[0] // TILE_N,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx.shape[0], 3), jnp.float32),
        interpret=interpret,
    )(gx, gy, seg)
    return out[:N, 0], out[:N, 1], out[:N, 2]


def pack_segments(net: RoadNetwork, ego_pos: jnp.ndarray, k_cull: int = 96) -> jnp.ndarray:
    """Cull the k segments nearest the ego and pack the [8, K_PAD] table
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
    ])
