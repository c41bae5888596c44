"""CILRS-TPU: a TPU-native autonomous-driving framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
rohithr87/CILRS-Autonomous-Driving-CARLA: on-device driving simulation
(kinematic vehicle dynamics, procedural Town01-like maps, a rasterized
front camera with weather shaders, NPC traffic), a CILRS conditional
imitation-learning policy (ResNet-34 trunk, 4 command branches, auxiliary
speed head), the full rule-based safety/control cascade, data collection,
training, and the Safety/Comfort/Route closed-loop scoring system —
all expressed as pure functions over pytrees so that the entire
collect -> train -> evaluate loop runs jit-compiled on TPU, batched over
thousands of environments via `vmap`/`shard_map` over a device mesh.

Unlike the reference (a CARLA TCP client), there is no simulator process:
the simulator *is* the framework, and one `jax.jit` step advances physics,
rendering, perception, the policy network, and the controller together.
"""

__version__ = "0.1.0"
