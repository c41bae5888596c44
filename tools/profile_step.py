"""Per-phase cost profile of the closed-loop env step (VERDICT r2 item 1).

Times each phase of the fused tick at bench shapes (E envs, batched policy):
render sub-passes (ground / vehicles / buildings / lights / motion blur),
perception, policy forward, controller+NPC+physics — each as its own jitted
vmapped program, plus the full fused chunk for the headline number.

Usage: python tools/profile_step.py  [E]  (default 128)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator

enable_compilation_cache()
require_accelerator()

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=10, inner=1):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / inner
    print(f"{name:34s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from cilrs_tpu.agent import perception
    from cilrs_tpu.agent.driver import fleet_rollout, make_driver_state
    from cilrs_tpu.agent.npc import npc_controller, pedestrian_step_targets
    from cilrs_tpu.agent.scenario import spawn_world
    from cilrs_tpu.config import TrainConfig, ModelConfig, load_weather_table
    from cilrs_tpu.core.dynamics import world_physics_step
    from cilrs_tpu.core.state import default_vehicle_params
    from cilrs_tpu.maps.network import light_states
    from cilrs_tpu.maps.routing import chained_route_pool
    from cilrs_tpu.maps.town import make_town01
    from cilrs_tpu.ops.image import normalize
    from cilrs_tpu.render import raster
    from cilrs_tpu.train.state import create_train_state

    net = make_town01(blocks_x=3, blocks_y=3)
    rng = np.random.RandomState(0)
    wt = load_weather_table()
    params = default_vehicle_params()
    pool = chained_route_pool(net, rng, num_routes=3)

    world = spawn_world(net, num_vehicles=12, num_pedestrians=5, rng=rng)
    base = make_driver_state(world)
    fleet = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape).copy(), base)
    fleet = fleet.replace(world=fleet.world.replace(
        rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(E, dtype=jnp.uint32)),
        weather_idx=jnp.arange(E, dtype=jnp.int32) % 5,
    ))

    cfg = TrainConfig(model=ModelConfig(dropout=0.0))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = state.apply_fn

    worlds = fleet.world
    lights = light_states(net, worlds.time_s[0])

    print(f"# E={E} devices={jax.devices()}")

    # --- full render ---
    @jax.jit
    def full_render(w):
        ls = light_states(net, w.time_s[0])
        return jax.vmap(lambda wi: raster.render_frame(net, wi, ls))(w)

    timeit("render_frame (full)", full_render, worlds)

    # --- ground only ---
    from cilrs_tpu.render.camera import CameraSpec, camera_position, ray_directions
    spec = raster.CAMERA

    def ground_only(w):
        o = camera_position(spec, w.ego_pos, w.ego_yaw)
        rays = ray_directions(spec, w.ego_yaw).reshape(-1, 3)
        dz = rays[:, 2]
        t_ground = jnp.where(dz < -1e-4, o[2] / jnp.maximum(-dz, 1e-6), raster.INF)
        gxy = o[:2] + rays[:, :2] * t_ground[:, None]
        return raster._ground_masks(net, w.ego_pos, gxy)

    timeit("ground masks only", jax.jit(jax.vmap(ground_only)), worlds)

    # --- vehicles OBB only ---
    def veh_only(w):
        o = camera_position(spec, w.ego_pos, w.ego_yaw)
        rays = ray_directions(spec, w.ego_yaw).reshape(-1, 3)
        o_rel = jnp.array([0.0, 0.0, 1.0], jnp.float32) * o[2]
        t, sh = raster._ray_obb(o_rel, rays, w.veh_pos[1:] - o[:2], w.veh_yaw[1:],
                                4.7 / 2, 1.0, raster.VEH_HEIGHT)
        return t.min(axis=1)

    timeit("vehicle OBB only", jax.jit(jax.vmap(veh_only)), worlds)

    # --- buildings only ---
    def bldg_only(w):
        o = camera_position(spec, w.ego_pos, w.ego_yaw)
        rays = ray_directions(spec, w.ego_yaw).reshape(-1, 3)
        o_rel = jnp.array([0.0, 0.0, 1.0], jnp.float32) * o[2]
        KB = min(raster.NUM_NEAR_BUILDINGS, net.bldg_xy.shape[0])
        d2b = jnp.sum((net.bldg_xy - w.ego_pos) ** 2, axis=-1)
        _, nearb = jax.lax.top_k(-d2b, KB)
        t, sh = raster._ray_obb(o_rel, rays, net.bldg_xy[nearb] - o[:2],
                                net.bldg_yaw[nearb], net.bldg_half[nearb, 0],
                                net.bldg_half[nearb, 1], net.bldg_h[nearb])
        return t.min(axis=1)

    timeit("buildings OBB only", jax.jit(jax.vmap(bldg_only)), worlds)

    # --- motion blur only ---
    img = jnp.zeros((E, spec.height, spec.width, 3), jnp.float32)

    @jax.jit
    def mb(imgs, w):
        return jax.vmap(raster.motion_blur)(imgs, jnp.abs(w.veh_speed[:, 0]) * 3.6)

    timeit("motion blur only", mb, img, worlds)

    # --- perception ---
    @jax.jit
    def perc(w):
        ls = light_states(net, w.time_s[0])
        def one(wi):
            d = perception.get_obstacle_distance(wi)
            t, _ = perception.check_traffic_light(net, ls, wi.ego_pos, wi.ego_yaw,
                                                  return_index=True)
            r = perception.ego_off_road(net, wi.ego_pos)
            return d, t, r
        return jax.vmap(one)(w)

    timeit("perception (3-horizon)", perc, worlds)

    # --- policy forward ---
    x = jnp.zeros((E, 88, 200, 3), jnp.float32)
    sp = jnp.zeros((E,), jnp.float32)
    cmd = jnp.zeros((E,), jnp.int32)

    @jax.jit
    def pol(v, x, sp, cmd):
        return apply_fn(v, x, sp, cmd, train=False)

    timeit("policy forward (batched)", pol, variables, x, sp, cmd)

    # --- NPC + physics ---
    @jax.jit
    def phys(w):
        ls = light_states(net, w.time_s[0])
        def one(wi):
            ctl, wp = npc_controller(net, wi, ls)
            return world_physics_step(wi.replace(veh_wp=wp), ctl,
                                      jnp.zeros((wi.num_vehicles,), bool), params,
                                      wt.friction[wi.weather_idx], 0.05)
        return jax.vmap(one)(w)

    timeit("npc + physics", phys, worlds)

    # --- full fused chunk (the bench program) ---
    T = 20

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(st):
        final, _ = fleet_rollout(st, steps=T, net=net, pool=pool, wt=wt,
                                 params=params, apply_fn=apply_fn,
                                 variables=variables, mode="drive",
                                 want_frames=False)
        return final

    t0 = time.perf_counter()
    fleet = chunk(fleet)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    print(f"# fused chunk compile+run: {time.perf_counter() - t0:.1f}s")
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        fleet = chunk(fleet)
    jax.block_until_ready(jax.tree.leaves(fleet)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{'fused chunk (20 ticks)':34s} {dt * 1e3:9.3f} ms   -> "
          f"{E * T / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
