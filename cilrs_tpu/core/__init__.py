"""Pure-functional world core: state pytrees, geometry, vehicle dynamics."""

from cilrs_tpu.core.state import WorldState, VehicleParams, make_world  # noqa: F401
from cilrs_tpu.core.dynamics import bicycle_step, world_physics_step  # noqa: F401
