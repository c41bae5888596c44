"""OSM import toolchain: XML -> RoadNetwork -> routes; OpenDRIVE export;
landmark mapping (parity with osm_to_xodr.py / load_cusat.py / map_landmarks.py)."""

import numpy as np
import pytest

from cilrs_tpu.maps import routing
from cilrs_tpu.maps.landmarks import landmarks_to_spawns, suggest_routes
from cilrs_tpu.maps.network import host_arrays
from cilrs_tpu.maps.osm import (
    export_opendrive, lat_lon_to_xy, load_osm_network, osm_to_graph, parse_osm,
)

# A small synthetic campus: two residential streets crossing + a service spur,
# plus one footway that must be filtered out.
OSM_XML = """<?xml version='1.0' encoding='UTF-8'?>
<osm version='0.6'>
  <node id='1' lat='10.0400' lon='76.3300'/>
  <node id='2' lat='10.0400' lon='76.3340'/>
  <node id='3' lat='10.0400' lon='76.3380'/>
  <node id='4' lat='10.0380' lon='76.3340'/>
  <node id='5' lat='10.0420' lon='76.3340'/>
  <node id='6' lat='10.0420' lon='76.3380'/>
  <node id='7' lat='10.0400' lon='76.3341'/>
  <way id='100'>
    <nd ref='1'/><nd ref='2'/><nd ref='3'/>
    <tag k='highway' v='residential'/>
  </way>
  <way id='101'>
    <nd ref='4'/><nd ref='2'/><nd ref='5'/>
    <tag k='highway' v='tertiary'/>
  </way>
  <way id='102'>
    <nd ref='5'/><nd ref='6'/>
    <tag k='highway' v='service'/>
  </way>
  <way id='103'>
    <nd ref='2'/><nd ref='7'/>
    <tag k='highway' v='footway'/>
  </way>
</osm>
"""


@pytest.fixture(scope="module")
def osm_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "campus.osm"
    p.write_text(OSM_XML)
    return str(p)


def test_parse_and_filter(osm_file):
    nodes, ways = parse_osm(osm_file)
    assert len(nodes) == 7
    assert len(ways) == 3  # footway dropped


def test_projection_roundtrip():
    x, y = lat_lon_to_xy(10.041, 76.331, 10.040, 76.330)
    # ~111 m per 0.001 deg lat; lon scaled by cos(lat).
    assert 100 < y < 122
    assert 100 < x < 122


def test_graph_and_network(osm_file):
    spec = osm_to_graph(osm_file)
    assert len(spec.edges) >= 4
    net = load_osm_network(osm_file, tex_scale=1.0)
    assert net.num_waypoints > 50
    assert net.num_spawn_points > 3
    # The crossing at node 2 becomes a junction with lights.
    assert net.num_lights >= 3
    # Routes are traceable on the imported map.
    h = host_arrays(net)
    r = None
    for dst in range(1, net.num_spawn_points):
        r = routing.trace_route(net, int(h.spawn_wp[0]), int(h.spawn_wp[dst]))
        if r is not None:
            break
    assert r is not None


def test_bounds_filter(osm_file):
    nodes, ways = parse_osm(osm_file, bounds=(10.039, 76.329, 10.041, 76.335))
    assert len(nodes) < 7  # far-east nodes clipped


def test_export_opendrive(osm_file, tmp_path):
    spec = osm_to_graph(osm_file)
    out = tmp_path / "campus.xodr"
    export_opendrive(spec, str(out))
    import xml.etree.ElementTree as ET

    root = ET.parse(out).getroot()
    assert root.tag == "OpenDRIVE"
    roads = root.findall("road")
    assert len(roads) == len(spec.edges)
    assert roads[0].find("planView/geometry/line") is not None
    lanes = roads[0].findall(".//lane")
    types = {l.get("type") for l in lanes}
    assert {"driving", "sidewalk"}.issubset(types)


def test_landmarks(osm_file):
    net = load_osm_network(osm_file, tex_scale=1.0)
    landmarks = {
        "Main Gate": (10.0400, 76.3302),
        "Library": (10.0418, 76.3340),
        "Far Corner": (10.0400, 76.3378),
    }
    mapping = landmarks_to_spawns(net, landmarks, origin=(10.0400, 76.3340))
    assert set(mapping) == set(landmarks)
    for info in mapping.values():
        assert info["snap_dist_m"] < 60.0
    routes = suggest_routes(mapping, num=3, min_sep_m=50.0)
    assert len(routes) >= 1
    assert "--spawn" in routes[0]["cli"]
