"""Device-mesh parallelism: mesh construction, sharded training, fleet rollouts.

The reference has no distributed execution at all (SURVEY.md §2.2) — its only
inter-process seam is the CARLA TCP RPC. Here scaling is native: env batches and
training batches shard over a `jax.sharding.Mesh` (ICI within a slice, DCN across
slices via jax.distributed), parameters replicate, and XLA inserts the collectives.
"""

from cilrs_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
