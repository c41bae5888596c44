"""Pallas ground-classification kernel vs the XLA reference path (interpret
mode on CPU; the compiled kernel runs on real TPU via the renderer flag)."""

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.render import raster
from cilrs_tpu.render.pallas_ground import ground_masks_pallas, pack_segments


def test_pallas_matches_xla_ground_masks(mini_town):
    net = mini_town
    wp = np.asarray(net.host.spawn_wp)[0]
    ego = jnp.asarray(np.asarray(net.host.wp_xy)[wp])

    rng = np.random.RandomState(0)
    # Ground points around the ego: on-road, sidewalk, grass, far.
    gxy = jnp.asarray(
        (np.asarray(net.host.wp_xy)[wp] + rng.uniform(-30, 30, (1024, 2))).astype(np.float32)
    )

    road_x, mark_x, side_x = raster._ground_masks(net, ego, gxy)
    seg = pack_segments(net, ego, k_cull=raster.NUM_NEAR_SEGMENTS)
    road_p, mark_p, side_p = ground_masks_pallas(seg, gxy - ego, interpret=True)

    # bf16 thresholds at mask boundaries can flip isolated pixels; demand
    # near-exact agreement instead of bitwise equality.
    assert np.mean(np.asarray(road_x) == np.asarray(road_p)) > 0.99
    assert np.mean(np.asarray(side_x) == np.asarray(side_p)) > 0.99
    assert np.mean(np.asarray(mark_x) == np.asarray(mark_p)) > 0.98
    # The masks are non-trivial on this sample.
    assert np.asarray(road_p).sum() > 10
    assert np.asarray(side_p).sum() > 10
