"""Road networks as flat arrays: procedural towns, OSM import, routing, queries.

Replaces CARLA's OpenDRIVE map + `map.get_waypoint` + `GlobalRoutePlanner`
(reference model/autonomous_drive.py:405-474, 652-665) with a statically-shaped
`RoadNetwork` pytree that lives on device, plus host-side graph construction and
route tracing (numpy / native C++).
"""

from cilrs_tpu.maps.network import RoadNetwork, build_network  # noqa: F401
from cilrs_tpu.maps.town import make_town01  # noqa: F401
from cilrs_tpu.maps.routing import Route, trace_route, RoutePool  # noqa: F401
