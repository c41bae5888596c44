"""Sharded fleet execution: the env batch spread over a device mesh.

`fleet_rollout` (agent/driver.py) is batch-first vmapped code; here its env
axis is annotated with a NamedSharding over the mesh's data axis so XLA
partitions the whole render+policy+dynamics megakernel across chips. The
policy parameters replicate (22 M params — pure DP, SURVEY.md §2.2); the only
collectives XLA needs are none at all in drive/collect mode, because every env
is independent: the program is embarrassingly parallel over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cilrs_tpu.agent.driver import DriverState, fleet_rollout
from cilrs_tpu.core.state import VehicleParams
from cilrs_tpu.config import WeatherTable
from cilrs_tpu.maps.network import RoadNetwork
from cilrs_tpu.maps.routing import RoutePool
from cilrs_tpu.parallel.mesh import DATA_AXIS
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.render.raster import CAMERA


def pad_fleet_to_mesh(fleet: DriverState, mesh: Mesh) -> tuple[DriverState, int]:
    """Pad the env axis up to a multiple of the mesh size (repeating env 0);
    returns (padded fleet, original size)."""
    n = mesh.devices.size
    E = jax.tree.leaves(fleet)[0].shape[0]
    pad = (-E) % n
    if pad == 0:
        return fleet, E
    fleet = jax.tree.map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0),
        fleet,
    )
    return fleet, E


def make_sharded_rollout(
    mesh: Mesh,
    steps: int,
    wt: WeatherTable,
    params: VehicleParams,
    apply_fn=None,
    mode: str = "drive",
    cam: CameraSpec = CAMERA,
    want_frames: bool = False,
    loop_routes: bool = True,
    pool_batched: bool = False,
    donate: bool = True,
):
    """Build a jitted (fleet, net, pool, variables) -> (fleet', outputs)
    rollout with the env axis sharded over the mesh and params replicated.

    net/pool/variables are jit ARGUMENTS (not closure constants): a closed-over
    22 M-param pytree becomes 90 MB of jaxpr constants (see cli/common.py)."""
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    rspec = NamedSharding(mesh, P())

    def run(fleet, net: RoadNetwork, pool: RoutePool, variables):
        return fleet_rollout(
            fleet, steps=steps, net=net, pool=pool, wt=wt, params=params,
            apply_fn=apply_fn, variables=variables, mode=mode, cam=cam,
            want_frames=want_frames, loop_routes=loop_routes,
            pool_batched=pool_batched,
        )

    jitted = jax.jit(
        run,
        in_shardings=(bspec, rspec, bspec if pool_batched else rspec, rspec),
        donate_argnums=(0,) if donate else (),
    )

    def call(fleet, net, pool, variables=None):
        # Pad the env axis to a mesh multiple (device_put with P(DATA_AXIS)
        # rejects uneven shards), then slice every output back to E.
        fleet, E = pad_fleet_to_mesh(fleet, mesh)
        if pool_batched:
            pool, _ = pad_fleet_to_mesh(pool, mesh)
        fleet = jax.device_put(fleet, bspec)
        if variables is not None:
            variables = jax.device_put(variables, rspec)
        final, outs = jitted(fleet, net, pool, variables)
        padded = jax.tree.leaves(final)[0].shape[0]
        if padded != E:
            final = jax.tree.map(lambda x: x[:E], final)
            # outputs are stacked [T, E_padded, ...]
            outs = jax.tree.map(lambda x: x[:, :E], outs)
        return final, outs

    return call
