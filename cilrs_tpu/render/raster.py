"""The rasterizer: per-pixel raycast of the world state into an RGB frame.

One pure function `render_frame(net, world, light_state) -> [H, W, 3] float32`
replacing the CARLA camera sensor + callback thread
(reference model/autonomous_drive.py:848-873). Geometry is analytic:

 - ground plane z=0 classified analytically against the K lane segments nearest
   the ego (road / lane-marking / sidewalk -> asphalt / paint / pavement /
   grass) — no per-pixel texture gathers (see _ground_masks);
 - vehicles as oriented boxes (slab test in the vehicle body frame), with
   emissive rear brake lamps while braking and dim taillights at night
   (CARLA vehicles light brake lamps whenever control.brake > 0, so the
   reference's camera carries the same anticipation cue);
 - pedestrians as vertical cylinders;
 - traffic lights as poles + emissive state-colored heads (the K nearest
   lights are gathered first so per-pixel cost is independent of map size);
 - procedural weather on top (fog, rain streaks, night headlight cone).

Everything is dense elementwise math over a [H*W] pixel array: no branches, no
dynamic shapes — XLA fuses the whole camera into a few VPU loops, and `vmap`
batches it over environments.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cilrs_tpu.core.state import WorldState
from cilrs_tpu.maps.network import RoadNetwork
from cilrs_tpu.render import weather as wx
from cilrs_tpu.render.camera import CameraSpec, camera_position, ray_directions

CAMERA = CameraSpec()

VEH_HEIGHT = 1.55
PED_RADIUS = 0.35
PED_HEIGHT = 1.8
LIGHT_POLE_H = 5.2
LIGHT_HEAD_R = 0.5
NUM_NEAR_LIGHTS = 8
# 10 nearest buildings (was 16): the r2 bench regression traced to the OBB and
# blur passes (tools/profile_step.py cost table in docs/PERF.md); beyond ~10
# the extra facades are behind the nearer ones >95% of frames.
NUM_NEAR_BUILDINGS = 10

INF = 1e9

# Muted facade palette (index-hashed per building).
_BLDG_COLORS = jnp.array([
    [0.58, 0.52, 0.45],
    [0.63, 0.58, 0.50],
    [0.48, 0.42, 0.38],
    [0.66, 0.60, 0.55],
    [0.55, 0.48, 0.40],
    [0.70, 0.64, 0.52],
    [0.52, 0.50, 0.46],
], jnp.float32)

# Small palette so NPC vehicles are visually distinct, like CARLA's blueprints.
_VEH_COLORS = jnp.array([
    [0.62, 0.12, 0.12],
    [0.12, 0.20, 0.55],
    [0.80, 0.80, 0.82],
    [0.15, 0.15, 0.17],
    [0.70, 0.55, 0.15],
    [0.25, 0.45, 0.28],
    [0.55, 0.30, 0.55],
    [0.85, 0.45, 0.10],
], jnp.float32)

_GRASS = jnp.array([0.22, 0.34, 0.16], jnp.float32)
_SIDEWALK = jnp.array([0.52, 0.50, 0.48], jnp.float32)
_ASPHALT = jnp.array([0.23, 0.23, 0.24], jnp.float32)
_MARKING = jnp.array([0.85, 0.85, 0.80], jnp.float32)
_POLE = jnp.array([0.25, 0.26, 0.28], jnp.float32)
_PED_COLOR = jnp.array([0.55, 0.35, 0.25], jnp.float32)
_TAILLIGHT = jnp.array([0.95, 0.07, 0.05], jnp.float32)
# Brake-lamp/taillight cue, OPT-IN for ablations only (read once at import,
# so it is static under jit). Default is lamps OFF: two A/B runs measured the
# cue as a shortcut feature that collapses LEFT/RIGHT steering (see the long
# comment at the glow computation below). CILRS_TPU_NO_LAMPS=1 is honored for
# backward compatibility with round-3 run scripts (it forces lamps off, which
# is already the default).
# NOTE (round-4 semantics change): CILRS_TPU_LAMPS=1 is now brake-glow ONLY.
# The pre-round-4 path rendered max(brake_glow, 0.35*night) — the ambient
# night glow moved to _NIGHT_LAMPS below at a different intensity (0.55), so
# round-3 lamp-ablation arms are NOT reproducible under this flag alone; set
# both flags (still not the old 0.35 weight) or check out the round-3 tree.
_LAMPS = (
    os.environ.get("CILRS_TPU_LAMPS", "") == "1"
    and os.environ.get("CILRS_TPU_NO_LAMPS", "") != "1"
)
# Night-only CONSTANT taillights, default OFF (CILRS_TPU_NIGHT_LAMPS=1
# opts in for ablations). The cue looked safe by construction — a constant
# always-on lamp carries zero correlation with the teacher's braking — but
# two round-5 A/B pairs measured it harmful anyway: with trajectories/labels
# BIT-IDENTICAL and only the lamp pixels differing, turn-steer MAE rose
# 1.26x (runs r5a vs arm4) and 1.5x (arm3 vs arm2). The damage is not a
# red-color shortcut (pasting taillight-red blobs into arc frames shifts the
# trained model's steer by only 0.007 — /tmp-probe, RESULTS_training.md
# round 5); at night a visible vehicle IS mostly a queue/follow context, so
# any vehicle-visibility cue concentrates on low-steer frames and drags turn
# predictions down. Honored alongside the legacy CILRS_TPU_NO_NIGHT_LAMPS=1.
_NIGHT_LAMPS = (
    os.environ.get("CILRS_TPU_NIGHT_LAMPS", "") == "1"
    and os.environ.get("CILRS_TPU_NO_NIGHT_LAMPS", "") != "1"
)
# Junction stop-bar/crosswalk paint: opt-in (measured harmful to turn
# steering — see _junction_markings).
_CROSSWALKS = os.environ.get("CILRS_TPU_CROSSWALKS", "") == "1"

_LIGHT_COLORS = jnp.array([
    [0.1, 0.95, 0.2],   # green
    [0.95, 0.8, 0.1],   # yellow
    [0.95, 0.1, 0.1],   # red
    [0.4, 0.4, 0.4],    # none/off
], jnp.float32)


NUM_NEAR_SEGMENTS = 72  # lane segments culled around the ego per frame

ROAD_HALF_W = 2.2  # m from a lane centerline (lanes 3.5 m, centers 3.5 m apart)
SIDEWALK_OUT = 4.2
MARKING_LAT = 1.75  # road-center double line sits left of each lane center
MARKING_HALF_W = 0.22


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-7, jnp.where(b >= 0, 1e-7, -1e-7), b)


def _ground_masks(net: RoadNetwork, ego_pos: jnp.ndarray, gxy: jnp.ndarray):
    """Analytic (gather-free per pixel) ground classification.

    Per-pixel texture fetches are gathers — pathologically slow on the TPU's
    strided vector memory. Instead we cull the K lane segments nearest the ego
    (one small top_k + gather per FRAME, not per pixel) and classify each ground
    hit by its min distance / signed lateral offset to those segments: pure
    elementwise math + a K-reduction that XLA fuses into one VPU loop.

    Returns (road, marking, sidewalk) float masks of shape gxy.shape[:-1].
    """
    d2 = jnp.sum((net.wp_xy - ego_pos) ** 2, axis=-1)  # [W]
    _, idx = jax.lax.top_k(-d2, NUM_NEAR_SEGMENTS)  # K nearest waypoints
    a = net.wp_xy[idx]  # [K,2]
    b = net.wp_xy[net.wp_next[idx, 0]]
    junction = net.wp_is_junction[idx]
    dash_on = (idx % 3) != 2  # same 2-on/1-off cadence as the map texture

    ab = b - a
    seg_len = jnp.sqrt(jnp.sum(ab * ab, axis=-1) + 1e-9)  # [K]
    dirn = (ab / seg_len[:, None])

    # bf16 for the [N,K] hot loop (2x VPU throughput): coordinates are
    # ego-centered first, so magnitudes stay < ~150 m and bf16's relative
    # precision gives <= ~10 cm error in the near field where edges matter.
    bf = jnp.bfloat16
    g16 = (gxy - ego_pos).astype(bf)  # [N,2]
    a16 = (a - ego_pos).astype(bf)  # [K,2]
    d16 = dirn.astype(bf)
    len16 = seg_len.astype(bf)

    relx = g16[..., 0:1] - a16[:, 0]  # [N,K]
    rely = g16[..., 1:2] - a16[:, 1]
    s = relx * d16[:, 0] + rely * d16[:, 1]  # along-track
    t = jnp.clip(s, 0.0, len16)
    lat = rely * d16[:, 0] - relx * d16[:, 1]  # signed, left +
    dx = relx - t * d16[:, 0]
    dy = rely - t * d16[:, 1]
    d2px = dx * dx + dy * dy  # [N,K] squared distance (avoid sqrt per element)

    dmin = jnp.sqrt(jnp.min(d2px, axis=-1).astype(jnp.float32) + 1e-12)  # [N]
    road = (dmin < ROAD_HALF_W).astype(jnp.float32)
    sidewalk = ((dmin >= ROAD_HALF_W) & (dmin < SIDEWALK_OUT)).astype(jnp.float32)
    on_marking = (
        (jnp.abs(lat - bf(MARKING_LAT)) < bf(MARKING_HALF_W))
        & (s > 0) & (s < len16)
        & dash_on & ~junction
    )
    marking = jnp.any(on_marking, axis=-1).astype(jnp.float32) * road
    return road, marking, sidewalk


def _junction_markings(net: RoadNetwork, ego_pos: jnp.ndarray,
                       gxy: jnp.ndarray) -> jnp.ndarray:
    """Stop-line bars + zebra crosswalks at signalized junction approaches.

    CARLA junctions carry stop lines and crosswalk paint; this renderer's
    junction interiors were bare asphalt, which starves the policy of the
    position-along-the-arc anchor it needs mid-turn once light COLORS stop
    being a reliable phase cue (junction-local light offsets — the round-5
    staggered-clock A/Bs measured LEFT/RIGHT steer MAE 2x worse without any
    light-independent junction landmark). World-anchored paint at every
    stop line is visible throughout the arc (entry bar behind, exit bar
    ahead, cross bars to the sides) and depends on nothing but geometry.

    MEASURED RESULT (round-5 arm5 vs arm4, only delta = this paint, 150k/6
    epochs): turn-steer MAE got WORSE (LEFT 0.069 vs 0.054) — the paint
    reads as lane-marking-like clutter near arcs rather than as an anchor.
    Default OFF (CILRS_TPU_CROSSWALKS=1 re-enables for future model work).

    One [N, K] pass over the K nearest lights — same shape of work as the
    ground-segment classification. Returns a [N] paint mask in [0, 1].
    """
    L = net.num_lights
    if L == 0:
        return jnp.zeros(gxy.shape[:-1], jnp.float32)
    K = min(NUM_NEAR_LIGHTS, L)
    d2l = jnp.sum((net.light_xy - ego_pos) ** 2, axis=-1)
    _, near = jax.lax.top_k(-d2l, K)
    lxy = net.light_xy[near]  # [K,2]
    lyaw = net.light_yaw[near]
    fwd = jnp.stack([jnp.cos(lyaw), jnp.sin(lyaw)], axis=-1)  # [K,2]
    bf = jnp.bfloat16
    rel_x = (gxy[..., 0:1] - lxy[:, 0]).astype(bf)  # [N,K]
    rel_y = (gxy[..., 1:2] - lxy[:, 1]).astype(bf)
    lon = rel_x * fwd[:, 0].astype(bf) + rel_y * fwd[:, 1].astype(bf)
    lat = rel_y * fwd[:, 0].astype(bf) - rel_x * fwd[:, 1].astype(bf)
    in_lane = jnp.abs(lat) <= bf(2.2)
    # Solid stop bar just before the line.
    bar = (lon >= bf(-0.6)) & (lon <= bf(0.0)) & in_lane
    # Zebra crosswalk past the line: stripes banded along the lane direction.
    zebra_band = jnp.mod(lat, bf(1.2)) < bf(0.6)
    walk = (lon >= bf(0.6)) & (lon <= bf(2.2)) & (jnp.abs(lat) <= bf(2.6)) & zebra_band
    return jnp.any(bar | walk, axis=-1).astype(jnp.float32)


def _motion_stretch(pxy: jnp.ndarray, yaw: jnp.ndarray,
                    speed_ms: jnp.ndarray) -> jnp.ndarray:
    """Compress world points along the travel direction by (1 + k*v) before
    hashing, so the value-noise cells render STRETCHED along motion — the
    exposure smear a real camera produces on the road surface. This is the
    frame's dominant speed cue for the aux speed head (the zoom blur encodes
    speed only in subtle sample weights): texture elongation is ~1.9x at the
    30 km/h cruise plateau and ~1.55x at the 18 km/h turn plateau. Pure
    elementwise math — no extra hash evaluations, no gathers."""
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    stretch = 1.0 + 0.11 * jnp.abs(speed_ms)
    along = pxy @ fwd
    return pxy + fwd[None, :] * (along * (1.0 / stretch - 1.0))[:, None]


def _hash2(p: jnp.ndarray, cell: float) -> jnp.ndarray:
    """Per-cell value noise in [0,1): hash of the quantized world-space point.
    Deterministic in world coordinates, so it behaves like real ground texture
    under ego motion (parallax-consistent)."""
    q = jnp.floor(p / cell)
    v = jnp.sin(q[..., 0] * 12.9898 + q[..., 1] * 78.233) * 43758.5453
    return v - jnp.floor(v)


def _ray_obb(o, d, center_xy, yaw, half_l, half_w, height):
    """Ray vs vertical oriented box. o [3], d [N,3]; box params scalars or [V].

    Broadcasts to [N, V]. Returns (t_hit [N,V], shade [N,V]); t=INF if miss.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # Body frame: x fwd, y left.
    ox = (o[0] - center_xy[..., 0]) * c + (o[1] - center_xy[..., 1]) * s  # [V]
    oy = -(o[0] - center_xy[..., 0]) * s + (o[1] - center_xy[..., 1]) * c
    oz = o[2]
    dx = d[:, None, 0] * c + d[:, None, 1] * s  # [N, V]
    dy = -d[:, None, 0] * s + d[:, None, 1] * c
    dz = d[:, None, 2]

    t1x = _safe_div(-half_l - ox, dx)
    t2x = _safe_div(half_l - ox, dx)
    t1y = _safe_div(-half_w - oy, dy)
    t2y = _safe_div(half_w - oy, dy)
    t1z = _safe_div(0.0 - oz, dz)
    t2z = _safe_div(height - oz, dz)

    tminx, tmaxx = jnp.minimum(t1x, t2x), jnp.maximum(t1x, t2x)
    tminy, tmaxy = jnp.minimum(t1y, t2y), jnp.maximum(t1y, t2y)
    tminz, tmaxz = jnp.minimum(t1z, t2z), jnp.maximum(t1z, t2z)
    tmin = jnp.maximum(jnp.maximum(tminx, tminy), tminz)
    tmax = jnp.minimum(jnp.minimum(tmaxx, tmaxy), tmaxz)
    hit = (tmax >= tmin) & (tmax > 0.0) & (tmin > 0.05)
    # Face shading by entry axis: side faces darker, top brightest.
    shade = jnp.where(tmin == tminz, 1.0, jnp.where(tmin == tminx, 0.72, 0.55))
    # Taillight lamp regions on the REAR face (-x in body frame; entered when
    # the ray travels toward +x): two bands at the outer rear corners at lamp
    # height. Pure elementwise math on intermediates the slab solve already
    # produced — no extra ray test. The caller scales this by per-box lamp
    # intensity (brake / night), which zeroes it for buildings.
    rear = hit & (tmin == tminx) & (dx > 0.0)
    y_hit = oy + tmin * dy
    z_hit = oz + tmin * dz
    yfrac = jnp.abs(y_hit) / jnp.maximum(half_w, 1e-3)
    lamp = rear & (yfrac > 0.50) & (yfrac < 0.94) & (z_hit > 0.42) & (z_hit < 0.76)
    return jnp.where(hit, tmin, INF), shade, lamp.astype(jnp.float32)


def _ray_cylinder(o, d, center_xy, radius, height):
    """Ray vs vertical cylinder; o [3], d [N,3], centers [P,2] -> t [N,P]."""
    ox = o[0] - center_xy[..., 0]  # [P]
    oy = o[1] - center_xy[..., 1]
    dx, dy = d[:, None, 0], d[:, None, 1]  # [N,1]
    a = dx * dx + dy * dy
    b = 2.0 * (dx * ox + dy * oy)
    cc = ox * ox + oy * oy - radius * radius
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.maximum(2.0 * a, 1e-7)
    z = o[2] + t * d[:, None, 2]
    hit = (disc > 0.0) & (t > 0.05) & (z >= 0.0) & (z <= height)
    return jnp.where(hit, t, INF)


def _ray_sphere(o, d, center, radius):
    """Ray vs spheres; centers [L,3] -> t [N,L]."""
    oc = o - center  # [L,3]
    b = 2.0 * jnp.einsum("nk,lk->nl", d, oc)
    cc = jnp.sum(oc * oc, axis=-1) - radius * radius  # [L]
    disc = b * b - 4.0 * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / 2.0
    hit = (disc > 0.0) & (t > 0.05)
    return jnp.where(hit, t, INF)


_MB_SCALES = (0.94, 0.88)  # zoom-blur sample scales toward the FOE
# Blur saturates at the actual top speed (45 km/h rule cap), not CARLA's 50:
# the aux speed head reads blur as its visual speed cue, and compressing the
# 0-35 km/h operating range into the bottom of the curve (r2: norm 50) left
# ~0.5 of the blur dynamic range unused — speed-head corr 0.931 vs the 0.9844
# target traces to exactly this cue being too flat between 20 and 35 km/h.
_MB_SPEED_NORM = 36.0  # km/h at which blur weight saturates


def _zoom_sample(img: jnp.ndarray, f: float) -> jnp.ndarray:
    """Bilinear resample of img scaled by factor f about the image center.

    Scales are Python constants, so the coordinates are separable static index
    arrays — two constant gathers per axis, no dynamic per-pixel gather."""
    import numpy as np

    H, W, _ = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    sy = cy + (np.arange(H) - cy) * f
    sx = cx + (np.arange(W) - cx) * f
    y0 = np.clip(np.floor(sy).astype(np.int32), 0, H - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fy = jnp.asarray((sy - y0)[:, None, None], jnp.float32)
    rows = img[y0] * (1.0 - fy) + img[y1] * fy
    x0 = np.clip(np.floor(sx).astype(np.int32), 0, W - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    fx = jnp.asarray((sx - x0)[None, :, None], jnp.float32)
    return rows[:, x0] * (1.0 - fx) + rows[:, x1] * fx


def motion_blur(img: jnp.ndarray, speed_kmh: jnp.ndarray) -> jnp.ndarray:
    """Speed-dependent zoom blur about the focus of expansion (image center —
    the front camera has zero pitch). CARLA's RGB camera applies motion blur
    by default (intensity 0.45), so the reference's training images carry a
    visual speed cue; without one the auxiliary speed head (CILRS's
    speed-prediction regularizer) has nothing to learn from."""
    samples = jnp.stack([img] + [_zoom_sample(img, f) for f in _MB_SCALES])
    b = jnp.clip(speed_kmh / _MB_SPEED_NORM, 0.0, 1.0) * 0.85
    w = b ** jnp.arange(float(len(_MB_SCALES) + 1))
    w = w / jnp.sum(w)
    return jnp.einsum("k,khwc->hwc", w, samples)


def render_frame(
    net: RoadNetwork,
    world: WorldState,
    light_state: jnp.ndarray,  # [L] int32 from maps.network.light_states
    spec: CameraSpec = CAMERA,
    include_ego: bool = False,  # True for chase/spectator views
) -> jnp.ndarray:
    """Render the ego's front camera. Returns [H, W, 3] float32 in [0, 1]."""
    H, W = spec.height, spec.width
    o = camera_position(spec, world.ego_pos, world.ego_yaw)  # [3]
    rays = ray_directions(spec, world.ego_yaw).reshape(-1, 3)  # [N,3]
    N = rays.shape[0]

    # --- ground plane ---
    dz = rays[:, 2]
    t_ground = jnp.where(dz < -1e-4, o[2] / jnp.maximum(-dz, 1e-6), INF)
    t_ground = jnp.where(t_ground < spec.far, t_ground, INF)
    gxy = o[:2] + rays[:, :2] * t_ground[:, None]
    # Ground classification stays on the XLA path: a Pallas version was built
    # and measured SLOWER end-to-end (XLA fuses the masks into the renderer's
    # select chain; the kernel paid a pad+transpose it never earned back).
    # The framework's Pallas investment lives where XLA is pathological
    # instead: ops/gather.py (resident-dataset batch gather).
    road, marking, sidewalk = _ground_masks(net, world.ego_pos, gxy)
    road_c = wx.wet_darken(world.weather_idx, _ASPHALT)
    g = _GRASS
    g = g * (1 - sidewalk[:, None]) + _SIDEWALK * sidewalk[:, None]
    g = g * (1 - road[:, None]) + road_c * road[:, None]
    # World-anchored surface grain (two-scale value noise on the ground hit
    # point). CARLA's textured world gives the policy dense parallax cues for
    # its position/phase along the road; a flat-shaded ground starves it of
    # exactly the longitudinal signal that aligns turn-phase labels (steer and
    # speed-plateau transitions). Pure elementwise math — no gathers.
    sxy = _motion_stretch(gxy, world.ego_yaw, jnp.abs(world.ego_speed))
    tex = 0.6 * _hash2(sxy, 1.7) + 0.4 * _hash2(sxy, 0.45) - 0.5
    # Smear also costs contrast: scale grain amplitude by 1/sqrt(stretch) so
    # luminance variance falls with speed too (a second, global cue).
    amp_v = jax.lax.rsqrt(1.0 + 0.11 * jnp.abs(world.ego_speed))
    amp = (0.035 * road + 0.05 * (1.0 - road)) * amp_v  # visible on dark asphalt
    g = jnp.clip(g + (amp * tex)[:, None], 0.0, 1.0)
    g = g * (1 - marking[:, None]) + _MARKING * marking[:, None]
    if _CROSSWALKS:  # measured-off default; see _junction_markings docstring
        jm = _junction_markings(net, world.ego_pos, gxy) * road
        g = g * (1 - jm[:, None]) + _MARKING * jm[:, None]
    ground_color = g

    # --- vehicles (all except ego) ---
    # No per-pixel gathers anywhere below: nearest-hit colors are resolved with
    # a one-hot mask contraction (an [N,V]x[V,3] matmul -> MXU) instead of
    # argmin + take_along_axis, which lowers to pathologically slow per-lane
    # gathers on TPU.
    # Actor ray tests stay f32: slab/quadratic intersections are numerically
    # delicate (bf16 flips tmin/tmax ordering on grazing rays, smearing hit
    # colors across the sky). Camera-centered coordinates keep magnitudes small.
    o_rel = jnp.array([0.0, 0.0, 1.0], jnp.float32) * o[2]

    # Vehicles and the K nearest buildings are all vertical OBBs; one merged
    # slab pass (one min + one one-hot palette matmul) replaces the two r2
    # passes — the single biggest recovery of the r2 bench regression.
    lo = 0 if include_ego else 1
    vpos = world.veh_pos[lo:] - o[:2]
    vyaw = world.veh_yaw[lo:]
    valive = world.veh_alive[lo:]
    V1 = vpos.shape[0]
    Bg = net.bldg_xy.shape[0]
    KB = min(NUM_NEAR_BUILDINGS, Bg)
    box_xy = [vpos]
    box_yaw = [vyaw]
    box_hl = [jnp.full((V1,), 4.7 / 2, jnp.float32)]
    box_hw = [jnp.full((V1,), 2.0 / 2, jnp.float32)]
    box_h = [jnp.full((V1,), VEH_HEIGHT, jnp.float32)]
    box_alive = [valive]
    box_pal = [_VEH_COLORS[(jnp.arange(V1) + 1) % _VEH_COLORS.shape[0]]]
    # Per-vehicle taillight intensity: brake lights when braking (CARLA
    # vehicles light their brake lamps whenever control.brake > 0, so the
    # reference's camera frames carry this anticipation cue — the teacher
    # brakes off ground-truth obstacle_dist, and without lamps the policy can
    # only read lead-vehicle deceleration from OBB size changes), plus dim
    # always-on taillights at night (vehicle visibility cue).
    vbrake = jnp.clip(world.veh_control[lo:, 2], 0.0, 1.0)
    vbrake = vbrake * (1.0 - world.veh_reverse[lo:].astype(jnp.float32))
    night = wx.night_level(world.weather_idx)
    # Taillights default OFF: the cue is a measured shortcut feature. The
    # round-2 form (clip(vbrake*3, 0, 1)) saturated a bright red glow onto
    # most junction/queue frames because the NPC P-controller carries small
    # brake values nearly every tick (agent/npc.py:134) — and training
    # learned a "red glow => hold steer 0" shortcut that collapsed LEFT/RIGHT
    # steering 5-8x (runs/r4a lamps-on vs runs/r4b lamps-off, identical
    # recipe/seed). A tamed variant (gate brake > 0.45, unamplified
    # 0.4+0.5*brake) was A/B'd as runs/r4d vs r4b and STILL costs 2.4x on
    # LEFT steer MAE (0.0131 vs 0.0056) and 7 points of within-0.01 (83.6%
    # vs 90.7%) — the queue-frame correlation survives any gating, so the
    # proven-best no-lamps render is the default. Set CILRS_TPU_LAMPS=1 to
    # re-enable the tamed cue for ablations.
    brake_glow = jnp.where(vbrake > 0.45, 0.4 + 0.5 * vbrake, 0.0)
    veh_glow = jnp.zeros((V1,), jnp.float32)
    if _LAMPS:  # brake-correlated glow: ablation-only (flag note above)
        veh_glow = jnp.maximum(veh_glow, brake_glow)
    if _NIGHT_LAMPS:  # constant night taillight (brake-decorrelated)
        veh_glow = jnp.maximum(veh_glow, jnp.full((V1,), 0.55) * night)
    box_glow = [veh_glow]
    if Bg > 0:
        d2b = jnp.sum((net.bldg_xy - world.ego_pos) ** 2, axis=-1)
        _, nearb = jax.lax.top_k(-d2b, KB)  # per-frame cull (small gather)
        box_xy.append(net.bldg_xy[nearb] - o[:2])
        box_yaw.append(net.bldg_yaw[nearb])
        box_hl.append(net.bldg_half[nearb, 0])
        box_hw.append(net.bldg_half[nearb, 1])
        box_h.append(net.bldg_h[nearb])
        box_alive.append(jnp.ones((KB,), bool))
        box_pal.append(_BLDG_COLORS[nearb % _BLDG_COLORS.shape[0]])
        box_glow.append(jnp.zeros((KB,), jnp.float32))
    if V1 + KB > 0:
        t_box, shade, lamp = _ray_obb(
            o_rel, rays,
            jnp.concatenate(box_xy), jnp.concatenate(box_yaw),
            jnp.concatenate(box_hl), jnp.concatenate(box_hw),
            jnp.concatenate(box_h),
        )
        t_box = jnp.where(jnp.concatenate(box_alive)[None, :], t_box, INF)
        glow = lamp * jnp.concatenate(box_glow)[None, :]  # [N, V1+KB]
        # Materialize the solve ONCE (bf16): without the barrier XLA re-fuses
        # the whole [N,V] ray-box solve into each of the four consumer
        # reductions below (min / tie-count / shade / palette dot), quadrupling
        # the VPU work — measured 3.3 ms/tick of the 10 ms fused step at E=128.
        # bf16 halves the materialized bytes; t only picks the winning surface
        # (sub-pixel silhouette error at range), and the exact-min tie compare
        # needs no epsilon because both sides are the same bf16 values.
        t16, sh16, gl16 = jax.lax.optimization_barrier(
            (t_box.astype(jnp.bfloat16), shade.astype(jnp.bfloat16),
             glow.astype(jnp.bfloat16)))
        t_v16 = jnp.min(t16, axis=1)
        # bf16(INF) rounds below the f32 INF sentinel; restore exact INF for
        # all-miss pixels or the sky loses the depth compare to the boxes.
        t_v = jnp.where(t_v16 < jnp.asarray(INF, jnp.bfloat16),
                        t_v16.astype(jnp.float32), INF)
        is_min = (t16 <= t_v16[:, None]) & (t16 < jnp.asarray(INF, jnp.bfloat16))
        norm = jnp.maximum(jnp.sum(is_min, axis=1, keepdims=True), 1)
        w_v = is_min.astype(jnp.float32) / norm  # [N, V1+KB]
        sh_v = jnp.sum(w_v * sh16.astype(jnp.float32), axis=1)
        v_color = (w_v @ jnp.concatenate(box_pal)) * sh_v[:, None]
        # Blend the winning pixel toward the emissive lamp color.
        glow_pix = jnp.clip(jnp.sum(w_v * gl16.astype(jnp.float32), axis=1),
                            0.0, 1.0)
        v_color = (v_color * (1.0 - glow_pix[:, None])
                   + _TAILLIGHT * glow_pix[:, None])
    else:  # ego-only, building-free world
        t_v = jnp.full((N,), INF)
        v_color = jnp.zeros((N, 3))
        glow_pix = jnp.zeros((N,))

    # --- pedestrians ---
    ped_rel = world.ped_pos - o[:2]
    t_ped_all = _ray_cylinder(o_rel, rays, ped_rel, PED_RADIUS, PED_HEIGHT)
    t_ped_all = jnp.where(world.ped_alive[None, :], t_ped_all, INF)
    t_p = jnp.min(t_ped_all, axis=1)

    # --- traffic lights: pole + emissive head, K nearest to ego ---
    L = net.num_lights  # static — Python branching on it is jit-safe
    K = min(NUM_NEAR_LIGHTS, max(L, 1))
    if L > 0:
        d2l = jnp.sum((net.light_xy - world.ego_pos) ** 2, axis=-1)
        _, near = jax.lax.top_k(-d2l, K)  # per-frame cull (small gather)
        lxy = net.light_xy[near]
        lyaw = net.light_yaw[near]
        lstate = light_state[near]
        # Pole on the right-hand side of the stop line.
        right = jnp.stack([jnp.sin(lyaw), -jnp.cos(lyaw)], axis=-1)
        pole_xy = lxy + right * 2.4
        pole_rel = pole_xy - o[:2]
        t_pole = _ray_cylinder(o_rel, rays, pole_rel, 0.12, LIGHT_POLE_H)
        t_pole_min = jnp.min(t_pole, axis=1)
        head = jnp.concatenate(
            [pole_rel, jnp.full((K, 1), LIGHT_POLE_H, jnp.float32)], axis=-1
        )
        t_head = _ray_sphere(o_rel, rays, head, LIGHT_HEAD_R)
        t_h = jnp.min(t_head, axis=1)
        is_min_h = (t_head <= t_h[:, None] + 1e-3) & (t_head < INF)
        norm_h = jnp.maximum(jnp.sum(is_min_h, axis=1, keepdims=True), 1)
        head_palette = _LIGHT_COLORS[lstate]  # [K,3] per frame, tiny
        head_color = (is_min_h.astype(jnp.float32) / norm_h) @ head_palette
    else:
        t_pole_min = jnp.full((N,), INF)
        t_h = jnp.full((N,), INF)
        head_color = jnp.zeros((N, 3))

    # --- compose: nearest hit wins (elementwise select chain, no gathers) ---
    # Emissive strength is per-pixel float: 1.0 for traffic-light heads,
    # glow_pix for vehicle taillight pixels (brake lamps shine through
    # fog/night dimming — exactly the conditions where the cue matters).
    t_hit = t_ground
    surf = ground_color
    emissive = jnp.zeros((N,), jnp.float32)
    for t_layer, c_layer, em in (
        (t_v, v_color, glow_pix),
        (t_p, jnp.broadcast_to(_PED_COLOR, (N, 3)), 0.0),
        (t_pole_min, jnp.broadcast_to(_POLE, (N, 3)), 0.0),
        (t_h, head_color, 1.0),
    ):
        closer = t_layer < t_hit
        surf = jnp.where(closer[:, None], c_layer, surf)
        emissive = jnp.where(closer, em, emissive)
        t_hit = jnp.minimum(t_layer, t_hit)
    is_sky = t_hit >= INF

    # --- sky + atmosphere ---
    elev = jnp.clip(rays[:, 2] / 0.6, 0.0, 1.0)
    sky = wx.sky_color(world.weather_idx, elev)
    lit = wx.apply_atmosphere(world.weather_idx, surf, jnp.minimum(t_hit, spec.far))
    # Emissive surfaces skip lighting/fog dimming proportionally.
    w_e = 0.9 * jnp.where(is_sky, 0.0, emissive)[:, None]
    lit = surf * w_e + lit * (1.0 - w_e)
    color = jnp.where(is_sky[:, None], sky, lit)

    img = color.reshape(H, W, 3)

    # --- screen-space weather: rain streaks, night headlight ---
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)
    dist_img = jnp.minimum(t_hit, spec.far).reshape(H, W)
    img = wx.headlight(world.weather_idx, uu, vv, dist_img, img)
    img = wx.rain_streaks(world.weather_idx, uu, vv, world.time_s, img)
    img = motion_blur(img, jnp.abs(world.ego_speed) * 3.6)

    return jnp.clip(img, 0.0, 1.0)
