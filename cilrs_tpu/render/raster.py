"""The rasterizer: per-pixel raycast of the world state into an RGB frame.

One pure function `render_frame(net, world, light_state) -> [H, W, 3] float32`
replacing the CARLA camera sensor + callback thread
(reference model/autonomous_drive.py:848-873). Geometry is analytic:

 - ground plane z=0 shaded from the pre-rasterized map texture (road /
   lane-marking / sidewalk masks -> asphalt / paint / pavement / grass);
 - vehicles as oriented boxes (slab test in the vehicle body frame);
 - pedestrians as vertical cylinders;
 - traffic lights as poles + emissive state-colored heads (the K nearest
   lights are gathered first so per-pixel cost is independent of map size);
 - procedural weather on top (fog, rain streaks, night headlight cone).

Everything is dense elementwise math over a [H*W] pixel array: no branches, no
dynamic shapes — XLA fuses the whole camera into a few VPU loops, and `vmap`
batches it over environments.
"""

from __future__ import annotations

import jax.numpy as jnp

from cilrs_tpu.core.state import WorldState
from cilrs_tpu.maps.network import LIGHT_GREEN, LIGHT_RED, LIGHT_YELLOW, RoadNetwork
from cilrs_tpu.maps.queries import sample_texture
from cilrs_tpu.render import weather as wx
from cilrs_tpu.render.camera import CameraSpec, camera_position, ray_directions

CAMERA = CameraSpec()

VEH_HEIGHT = 1.55
PED_RADIUS = 0.35
PED_HEIGHT = 1.8
LIGHT_POLE_H = 5.2
LIGHT_HEAD_R = 0.5
NUM_NEAR_LIGHTS = 8
INF = 1e9

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

_LIGHT_COLORS = jnp.array([
    [0.1, 0.95, 0.2],   # green
    [0.95, 0.8, 0.1],   # yellow
    [0.95, 0.1, 0.1],   # red
    [0.4, 0.4, 0.4],    # none/off
], jnp.float32)


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) < 1e-7, jnp.where(b >= 0, 1e-7, -1e-7), b)


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
    return jnp.where(hit, tmin, INF), shade


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


def render_frame(
    net: RoadNetwork,
    world: WorldState,
    light_state: jnp.ndarray,  # [L] int32 from maps.network.light_states
    spec: CameraSpec = CAMERA,
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
    tex = sample_texture(net, gxy)  # [N,3] road, marking, sidewalk
    road_c = wx.wet_darken(world.weather_idx, _ASPHALT)
    g = _GRASS
    g = g * (1 - tex[:, 2:3]) + _SIDEWALK * tex[:, 2:3]
    g = g * (1 - tex[:, 0:1]) + road_c * tex[:, 0:1]
    g = g * (1 - tex[:, 1:2]) + _MARKING * tex[:, 1:2]
    ground_color = g

    # --- vehicles (all except ego) ---
    vpos = world.veh_pos[1:]
    vyaw = world.veh_yaw[1:]
    valive = world.veh_alive[1:]
    t_veh, shade = _ray_obb(o, rays, vpos, vyaw, 4.7 / 2, 2.0 / 2, VEH_HEIGHT)
    t_veh = jnp.where(valive[None, :], t_veh, INF)
    vidx = jnp.argmin(t_veh, axis=1)
    t_v = jnp.take_along_axis(t_veh, vidx[:, None], axis=1)[:, 0]
    sh_v = jnp.take_along_axis(shade, vidx[:, None], axis=1)[:, 0]
    v_color = _VEH_COLORS[(vidx + 1) % _VEH_COLORS.shape[0]] * sh_v[:, None]

    # --- pedestrians ---
    t_ped_all = _ray_cylinder(o, rays, world.ped_pos, PED_RADIUS, PED_HEIGHT)
    t_ped_all = jnp.where(world.ped_alive[None, :], t_ped_all, INF)
    t_p = jnp.min(t_ped_all, axis=1)

    # --- traffic lights: pole + emissive head, K nearest to ego ---
    L = net.num_lights  # static — Python branching on it is jit-safe
    K = min(NUM_NEAR_LIGHTS, max(L, 1))
    if L > 0:
        d2l = jnp.sum((net.light_xy - world.ego_pos) ** 2, axis=-1)
        near = jnp.argsort(d2l)[:K]
        lxy = net.light_xy[near]
        lyaw = net.light_yaw[near]
        lstate = light_state[near]
        # Pole on the right-hand side of the stop line.
        right = jnp.stack([jnp.sin(lyaw), -jnp.cos(lyaw)], axis=-1)
        pole_xy = lxy + right * 2.4
        t_pole = _ray_cylinder(o, rays, pole_xy, 0.12, LIGHT_POLE_H)
        t_pole_min = jnp.min(t_pole, axis=1)
        head = jnp.concatenate(
            [pole_xy, jnp.full((K, 1), LIGHT_POLE_H, jnp.float32)], axis=-1
        )
        t_head = _ray_sphere(o, rays, head, LIGHT_HEAD_R)
        hidx = jnp.argmin(t_head, axis=1)
        t_h = jnp.take_along_axis(t_head, hidx[:, None], axis=1)[:, 0]
        head_color = _LIGHT_COLORS[lstate[hidx]]
    else:
        t_pole_min = jnp.full((N,), INF)
        t_h = jnp.full((N,), INF)
        head_color = jnp.zeros((N, 3))

    # --- compose: nearest hit wins ---
    t_all = jnp.stack([t_ground, t_v, t_p, t_pole_min, t_h], axis=0)  # [5,N]
    colors = jnp.stack(
        [ground_color,
         v_color,
         jnp.broadcast_to(_PED_COLOR, (N, 3)),
         jnp.broadcast_to(_POLE, (N, 3)),
         head_color],
        axis=0,
    )  # [5,N,3]
    winner = jnp.argmin(t_all, axis=0)  # [N]
    t_hit = jnp.min(t_all, axis=0)
    surf = jnp.take_along_axis(colors, winner[None, :, None], axis=0)[0]  # [N,3]
    is_sky = t_hit >= INF

    # --- sky + atmosphere ---
    elev = jnp.clip(rays[:, 2] / 0.6, 0.0, 1.0)
    sky = wx.sky_color(world.weather_idx, elev)
    lit = wx.apply_atmosphere(world.weather_idx, surf, jnp.minimum(t_hit, spec.far))
    # Emissive traffic-light heads skip lighting/fog dimming partially.
    emissive = (winner == 4) & ~is_sky
    lit = jnp.where(emissive[:, None], surf * 0.9 + lit * 0.1, lit)
    color = jnp.where(is_sky[:, None], sky, lit)

    img = color.reshape(H, W, 3)

    # --- screen-space weather: rain streaks, night headlight ---
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)
    dist_img = jnp.minimum(t_hit, spec.far).reshape(H, W)
    img = wx.headlight(world.weather_idx, uu, vv, dist_img, img)
    img = wx.rain_streaks(world.weather_idx, uu, vv, world.time_s, img)

    return jnp.clip(img, 0.0, 1.0)
