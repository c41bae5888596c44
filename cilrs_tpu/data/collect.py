"""Batched on-device data collection (the collect_data.py replacement).

The reference runs ONE ego on CARLA's autopilot at 20 Hz, JPEG-encoding every
frame in the hot loop (model/collect_data.py:622-752, disk I/O per tick). Here a
whole fleet of envs rolls out under `vmap(lax.scan(env_step))` on device — the
autopilot teacher, NPC traffic, rendering, and command labeling all inside one
jit — and frames/labels stream back to the host in large chunks at chunk
boundaries only.

Output format parity: a session directory with
 - `measurements.csv` with the exact 14-column schema of the reference
   (collect_data.py:549-564): frame, image_filename, steer, throttle, brake,
   speed_kmh, speed_normalized, high_level_command, command_name, position_x/y/z,
   yaw, timestamp;
 - frames as `frames_XXXX.npz` shards (uint8 [N, 88, 200, 3]) by default, or
   individual JPEGs with --format jpeg (the reference's layout);
 - `summary.txt` with the command distribution (collect_data.py:774-818).

Stationary frames are skipped (reference :678-679) at the indexing level: rows
are filtered before writing, frames keep their alignment via the row indices.
"""

from __future__ import annotations

import csv
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.agent.controller import ST_OK
from cilrs_tpu.agent.driver import DT, make_driver_state, rollout
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.config import SPEED_NORM_FACTOR, COMMAND_NAMES, load_weather_table
from cilrs_tpu.core.state import default_vehicle_params
from cilrs_tpu.maps.network import RoadNetwork
from cilrs_tpu.maps.routing import chained_route_pool
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.render.raster import CAMERA

CSV_HEADER = [
    "frame", "image_filename", "steer", "throttle", "brake", "speed_kmh",
    "speed_normalized", "high_level_command", "command_name",
    "position_x", "position_y", "position_z", "yaw", "timestamp",
]
MIN_SPEED_KMH = 0.5  # stationary-frame skip threshold


def collect_session(
    net: RoadNetwork,
    output_dir: str,
    num_frames: int = 10_000,
    num_envs: int = 16,
    num_vehicles: int = 12,
    num_pedestrians: int = 6,
    weather_idx: int = 0,
    seed: int = 0,
    chunk_steps: int = 100,
    cam: CameraSpec = CAMERA,
    image_format: str = "npz",
    verbose: bool = True,
) -> dict:
    """Collect ~num_frames labeled frames. Returns summary stats."""
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    wt = load_weather_table()
    params = default_vehicle_params()

    # Per-env chained route pools and spawns.
    pools = []
    states = []
    for e in range(num_envs):
        pool, meta = chained_route_pool(net, rng, num_routes=4, min_dist=60.0,
                                        max_dist=280.0, with_meta=True)
        start_wp = meta["start_wps"][0]
        world = spawn_world(net, num_vehicles, num_pedestrians, rng,
                            weather_idx=weather_idx, seed=seed + e)
        from cilrs_tpu.maps.network import host_arrays

        h = host_arrays(net)
        wp_xy = h.wp_xy
        wp_yaw = h.wp_yaw
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(wp_xy[start_wp])),
            veh_yaw=world.veh_yaw.at[0].set(float(wp_yaw[start_wp])),
            rng=jax.random.PRNGKey(seed * 1000 + e),
        )
        pools.append(pool)
        states.append(make_driver_state(world))

    pool_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pools)
    state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(st):
        def one(s, p):
            return rollout(
                s, steps=chunk_steps, net=net, pool=p, wt=wt, params=params,
                policy_fn=None, mode="collect", cam=cam, want_frames=True,
            )
        return jax.vmap(one)(st, pool_stack)

    csv_path = os.path.join(output_dir, "measurements.csv")
    csv_f = open(csv_path, "w", newline="")
    writer = csv.writer(csv_f)
    writer.writerow(CSV_HEADER)

    # Sidecar with the teacher's gating inputs (obstacle distance, traffic-light
    # state). measurements.csv keeps the exact 14-column reference schema
    # (collect_data.py:549-564); the aux file exists so label-noise analysis
    # (tools/label_noise_floor.py) can match repeat states on the OBSERVABLE
    # quantities the teacher conditions on — without it, pairs with different
    # lead-vehicle/light context inflate the estimated throttle/brake floor.
    aux_path = os.path.join(output_dir, "aux.csv")
    aux_f = open(aux_path, "w", newline="")
    aux_writer = csv.writer(aux_f)
    aux_writer.writerow(["frame", "obstacle_dist", "tl_state"])

    # SIGINT-graceful stop (reference collect_data.py:144-149): first Ctrl-C
    # finishes the current chunk, writes the CSV tail + summary.txt, and
    # returns normally; a second Ctrl-C falls through to the default handler.
    import signal

    interrupted = {"flag": False}

    def _on_sigint(signum, frame_):
        interrupted["flag"] = True
        signal.signal(signal.SIGINT, prev_handler)
        print("\n  SIGINT: finishing current chunk, writing summary...",
              flush=True)

    try:
        prev_handler = signal.signal(signal.SIGINT, _on_sigint)
    except ValueError:  # non-main thread (tests): no handler, no graceful stop
        prev_handler = None

    total = 0
    shard_id = 0
    cmd_counts = np.zeros(4, np.int64)
    t0 = time.time()
    while total < num_frames and not interrupted["flag"]:
        state, outs = chunk(state)
        frames = np.asarray(jax.device_get(outs["frame"]))  # [E, T, H, W, 3] uint8
        controls = np.asarray(outs["control"])  # [E, T, 3]
        speeds = np.asarray(outs["speed_kmh"])  # [E, T]
        cmds = np.asarray(outs["command"])
        poss = np.asarray(outs["pos"])
        yaws = np.asarray(outs["yaw"])

        E, T = speeds.shape
        # Stationary-frame skip (reference collect_data.py:678-679) plus label
        # hygiene: drop recovery/teleport frames whose controls come from the
        # pseudo-random recovery machine, not the teacher (unlearnable labels;
        # the reference's autopilot dataset never contains such frames).
        status = np.asarray(outs["status"]).reshape(-1)
        keep = (speeds.reshape(-1) > MIN_SPEED_KMH) & (status == ST_OK)
        idx = np.nonzero(keep)[0]
        if idx.size == 0:
            continue
        fr = frames.reshape(E * T, *frames.shape[2:])[idx]
        ct = controls.reshape(E * T, 3)[idx]
        sp = speeds.reshape(-1)[idx]
        cm = cmds.reshape(-1)[idx]
        po = poss.reshape(E * T, 2)[idx]
        yw = yaws.reshape(-1)[idx]
        od = np.asarray(outs["obstacle_dist"]).reshape(-1)[idx]
        tl = np.asarray(outs["tl_state"]).reshape(-1)[idx]

        shard_name = f"frames_{shard_id:04d}.npz"
        if image_format == "npz":
            np.savez_compressed(os.path.join(output_dir, shard_name), frames=fr)
            fnames = [f"{shard_name}#{k}" for k in range(len(idx))]
        else:
            from PIL import Image

            fnames = []
            for k in range(len(idx)):
                fn = f"frame_{total + k:08d}.jpg"
                Image.fromarray(fr[k]).save(
                    os.path.join(output_dir, fn), quality=95
                )
                fnames.append(fn)

        now = time.time()
        for k in range(len(idx)):
            cmd_i = int(cm[k])
            cmd_counts[cmd_i] += 1
            writer.writerow([
                total + k, fnames[k],
                f"{ct[k, 0]:.6f}", f"{ct[k, 1]:.6f}", f"{ct[k, 2]:.6f}",
                f"{sp[k]:.3f}",
                f"{min(sp[k] / SPEED_NORM_FACTOR, 1.0):.6f}",
                cmd_i, COMMAND_NAMES[cmd_i],
                f"{po[k, 0]:.3f}", f"{po[k, 1]:.3f}", "0.000",
                f"{np.degrees(yw[k]):.3f}", f"{now:.3f}",
            ])
            aux_writer.writerow([total + k, f"{od[k]:.3f}", int(tl[k])])
        total += len(idx)
        shard_id += 1
        if verbose:
            fps = total / max(time.time() - t0, 1e-9)
            print(f"  collected {total}/{num_frames} frames ({fps:.0f} frames/s)")

    csv_f.close()
    aux_f.close()
    if prev_handler is not None and not interrupted["flag"]:
        signal.signal(signal.SIGINT, prev_handler)
    stats = {
        "interrupted": interrupted["flag"],
        "frames": total,
        "command_distribution": {COMMAND_NAMES[i]: int(cmd_counts[i]) for i in range(4)},
        "wall_time_s": time.time() - t0,
        "frames_per_sec": total / max(time.time() - t0, 1e-9),
        "sim_hz": total / max(DT * chunk_steps * shard_id, 1e-9),
    }
    _save_summary(output_dir, stats, num_envs, weather_idx)
    return stats


def _save_summary(output_dir: str, stats: dict, num_envs: int, weather_idx: int):
    """summary.txt parity (reference collect_data.py:774-818)."""
    from cilrs_tpu.config import WEATHER_NAMES

    lines = [
        "=" * 50,
        "DATA COLLECTION SUMMARY",
        "=" * 50,
        f"Total frames:   {stats['frames']}",
        f"Weather:        {WEATHER_NAMES[weather_idx]}",
        f"Parallel envs:  {num_envs}",
        f"Wall time:      {stats['wall_time_s']:.1f} s",
        f"Throughput:     {stats['frames_per_sec']:.0f} frames/s",
        "",
        "Command distribution:",
    ]
    total = max(stats["frames"], 1)
    for name, count in stats["command_distribution"].items():
        lines.append(f"  {name:12s} {count:8d}  ({100.0 * count / total:.1f}%)")
    with open(os.path.join(output_dir, "summary.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
