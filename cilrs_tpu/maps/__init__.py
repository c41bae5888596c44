"""Road networks as flat arrays: procedural towns, OSM import, routing, queries.

Replaces CARLA's OpenDRIVE map + `map.get_waypoint` + `GlobalRoutePlanner`
(reference model/autonomous_drive.py:405-474, 652-665) with a statically-shaped
`RoadNetwork` pytree that lives on device, plus host-side graph construction and
route tracing (numpy / native C++).
"""

# Build/load the native C++ router at import time, BEFORE any JAX op runs:
# spawning g++ after the TPU backend initializes its thread pool can deadlock
# the child launch. Failure here is fine — routing falls back to numpy Dijkstra.
try:  # pragma: no cover - environment dependent
    from cilrs_tpu.maps import native_graph as _native_graph  # noqa: F401
except Exception:
    _native_graph = None

from cilrs_tpu.maps.network import RoadNetwork, build_network  # noqa: F401
from cilrs_tpu.maps.town import make_town01  # noqa: F401
from cilrs_tpu.maps.routing import Route, trace_route, RoutePool  # noqa: F401
