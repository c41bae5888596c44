"""Mesh construction and sharding helpers.

One logical axis `"data"` carries both the training batch and the env fleet —
the CILRS model (22 M params) is far too small to need tensor parallelism
(SURVEY.md §2.2), so pure DP over ICI is the idiomatic layout. The helpers are
explicit NamedShardings so the same code runs single-chip, on a virtual 8-CPU
mesh in tests, and on real pods.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """jax.shard_map across JAX versions (jax.experimental.shard_map before
    0.8), with replication/varying-axis checking off: the fused loop's psum'd
    ring counters are replicated by construction, which the static analysis
    cannot always prove."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis of every leaf over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
