"""On-device data collection into an HBM-resident training table.

The disk path (data/collect.py) streams every rendered frame to the host — but
the single-chip axon tunnel moves ~5.8 MB/s device->host (measured: 169 MB
device_get in 29 s), so a 180K-frame dataset (9.5 GB of uint8 frames) costs
~27 minutes of pure transfer, and the only consumer of those bytes is the trainer, which
immediately ships them BACK to the device (train/loop.py's resident path).
This module deletes the round trip, the reference's disk hop included
(collect_data.py:685-716 JPEG-encodes every frame inside its 20 Hz loop):
frames are scatter-compacted straight into the flat [N, R, 128] uint8 table
layout that ops/gather.py's Pallas row-gather kernel reads, and only the label
scalars (~7 MB) ever cross to the host — for the stratified split, the
weighted sampler, CSV parity, and the label-noise tooling.

Label hygiene matches data/collect.py: stationary frames (reference
collect_data.py:678-679) and recovery/teleport frames (pseudo-random controls,
unlearnable) never enter the table — the compacting scatter drops them, so
unlike the fused ring's masked writes (train/fused.py write_chunk) no capacity
is wasted on invalid rows.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.agent.controller import ST_OK
from cilrs_tpu.agent.driver import DT, fleet_rollout, make_driver_state
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.config import (
    COMMAND_NAMES,
    SPEED_NORM_FACTOR,
    WEATHER_NAMES,
    load_weather_table,
)
from cilrs_tpu.core.state import default_vehicle_params
from cilrs_tpu.maps.network import RoadNetwork, host_arrays
from cilrs_tpu.maps.routing import chained_route_pool
from cilrs_tpu.ops.gather import (
    LANE, PAGE_BYTE_LIMIT, padded_row_elems, paged_layout,
)
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.render.raster import CAMERA

MIN_SPEED_KMH = 0.5  # stationary-frame skip threshold (collect_data.py:678)


def make_fleet(
    net: RoadNetwork,
    num_envs: int,
    num_vehicles: int,
    num_pedestrians: int,
    rng: np.random.RandomState,
    seed: int,
    weather_idx: int | None = None,
):
    """Fleet of driver states + per-env chained route pools (mixed weathers
    when weather_idx is None, matching the fused loop's e % 5 rotation)."""
    hn = host_arrays(net)
    pools, states = [], []
    for e in range(num_envs):
        pool, meta = chained_route_pool(net, rng, num_routes=4, min_dist=60.0,
                                        max_dist=280.0, with_meta=True)
        w_idx = (e % 5) if weather_idx is None else weather_idx
        world = spawn_world(net, num_vehicles, num_pedestrians, rng,
                            weather_idx=w_idx, seed=seed + e)
        start_wp = meta["start_wps"][0]
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(hn.wp_xy[start_wp])),
            veh_yaw=world.veh_yaw.at[0].set(float(hn.wp_yaw[start_wp])),
            rng=jax.random.PRNGKey(seed * 997 + e),
        )
        pools.append(pool)
        states.append(make_driver_state(world))
    pool_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pools)
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return fleet, pool_stack


def collect_resident(
    net: RoadNetwork,
    num_frames: int,
    num_envs: int = 64,
    num_vehicles: int = 12,
    num_pedestrians: int = 6,
    weather_idx: int | None = None,
    seed: int = 0,
    chunk_steps: int = 50,
    cam: CameraSpec = CAMERA,
    output_dir: str | None = None,
    verbose: bool = True,
    max_page_bytes: int = PAGE_BYTE_LIMIT,
) -> tuple[dict, dict, dict]:
    """Collect exactly `num_frames` teacher-labeled frames into HBM.

    Returns (table, labels, stats):
      - table: device arrays — images: a TUPLE of pages, each [S, R, 128]
        uint8 (gather_rows layout, rows tile-dense-padded) and each strictly
        under 2^33 bytes (ops/gather.PAGE_BYTE_LIMIT — the boundary every
        collapsed big-table training run's eval gather crossed; paging keeps
        all gather operands below it, which is what lifted the round-4 157k-
        frame quarantine); page_rows (logical rows per non-final page; global
        row g = pages[g // page_rows][g % page_rows]); speed [N] f32
        (normalized), command [N] i32, controls [N, 3] f32, image_shape.
        Collections under ~157k frames fit one page and behave exactly as
        before.
      - labels: the same labels as host numpy, plus speed_kmh / pos / yaw /
        obstacle_dist / tl_state for CSV + noise-floor tooling;
      - stats: frames/s, sim Hz, command distribution.

    With output_dir, writes measurements.csv (exact 14-column reference
    schema, collect_data.py:549-564, image_filename = "resident#<row>"),
    aux.csv and summary.txt — everything but the image bytes.
    """
    if os.environ.get("CILRS_TPU_ALLOW_BIG_TABLE") == "1":
        # Diagnostic escape hatch (the round-4 collapse tooling, tools/exp_*):
        # build ONE monolithic page even past the 2^33-byte boundary, so the
        # pathological boundary-crossing gathers stay reproducible.
        max_page_bytes = 2 ** 40

    rng = np.random.RandomState(seed)
    wt = load_weather_table()
    params = default_vehicle_params()
    fleet, pool_stack = make_fleet(net, num_envs, num_vehicles,
                                   num_pedestrians, rng, seed, weather_idx)

    H, W = cam.height, cam.width
    D = H * W * 3
    D_pad = padded_row_elems(D, np.uint8)
    R = D_pad // LANE
    N = num_frames
    M = num_envs * chunk_steps
    # M slack slots per page: each chunk writes its FULL [M]-row block (kept
    # frames sorted first) with one contiguous dynamic_update_slice at the
    # cursor, then advances by the kept count — the dropped-frame tail is
    # overwritten by the next chunk. Per-row scatter compaction is the wrong
    # primitive on TPU (XLA expands big scatters into serial per-row loops:
    # measured ~30x slower chunks AND a ~3x longer compile); one DUS is a
    # single DMA. The slack guarantees cursor + M <= page_slots, so the DUS
    # never clamps and garbage rows never land inside the logical range.
    #
    # Pages: each page is an independent physical table strictly under
    # max_page_bytes (2^33 by default — the offset boundary behind the
    # round-4 big-table training collapse; see ops/gather.PAGE_BYTE_LIMIT).
    # Pages are balanced so one compiled chunk program serves them all; when
    # a page's cursor passes its logical capacity the (< M) overshoot rows
    # are dropped and collection continues into a fresh page.
    num_pages, page_rows, page_slots = paged_layout(
        N, R * LANE, M, max_page_bytes)

    def _new_page():
        table = {
            "images": jnp.zeros((page_slots, R, LANE), jnp.uint8),
            "speed": jnp.zeros((page_slots,), jnp.float32),
            "command": jnp.zeros((page_slots,), jnp.int32),
            "controls": jnp.zeros((page_slots, 3), jnp.float32),
        }
        aux = {
            "speed_kmh": jnp.zeros((page_slots,), jnp.float32),
            "pos": jnp.zeros((page_slots, 2), jnp.float32),
            "yaw": jnp.zeros((page_slots,), jnp.float32),
            "obstacle_dist": jnp.zeros((page_slots,), jnp.float32),
            "tl_state": jnp.zeros((page_slots,), jnp.int32),
            # Provenance for the label-noise tooling: interleaved envs put
            # temporally-adjacent frames of one env ~num_envs CSV rows apart,
            # so a row-distance exclusion can't identify "the same pass
            # through this state" — env id + absolute tick can
            # (tools/label_noise_floor.py).
            "env": jnp.zeros((page_slots,), jnp.int32),
            "tick": jnp.zeros((page_slots,), jnp.int32),
        }
        return table, aux

    table, aux = _new_page()
    done_pages: list[tuple[dict, dict]] = []  # filled pages (logical=page_rows)
    # Flat chunk rows are ordered (t, e): row = t * num_envs + e.
    env_ids = jnp.tile(jnp.arange(num_envs, dtype=jnp.int32), chunk_steps)
    tick_ids = jnp.repeat(jnp.arange(chunk_steps, dtype=jnp.int32), num_envs)

    def _dus(dst, upd, cursor):
        idx = (cursor,) + (jnp.asarray(0, jnp.int32),) * (dst.ndim - 1)
        return jax.lax.dynamic_update_slice(dst, upd, idx)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def chunk(tbl, ax, fl, ps, cursor, base_tick):
        fl2, outs = fleet_rollout(
            fl, chunk_steps, net, ps, wt, params,
            mode="collect", cam=cam, want_frames=True, pool_batched=True,
            flat_frames=True,
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        speed_kmh = flat(outs["speed_kmh"])
        keep = (speed_kmh > MIN_SPEED_KMH) & (flat(outs["status"]) == ST_OK)
        # Stable sort brings kept rows to the front in temporal order; the
        # whole permuted block lands with one DUS.
        perm = jnp.argsort(jnp.logical_not(keep), stable=True)
        frames = flat(outs["frame"])[perm]  # [M, D] (flat_frames layout)
        frames = jnp.pad(frames, ((0, 0), (0, D_pad - D))).reshape(-1, R, LANE)
        tbl2 = {
            "images": _dus(tbl["images"], frames, cursor),
            "speed": _dus(tbl["speed"], jnp.clip(
                speed_kmh[perm] / SPEED_NORM_FACTOR, 0.0, 1.0), cursor),
            "command": _dus(tbl["command"],
                            flat(outs["command"]).astype(jnp.int32)[perm], cursor),
            "controls": _dus(tbl["controls"], flat(outs["control"])[perm], cursor),
        }
        ax2 = {
            "speed_kmh": _dus(ax["speed_kmh"], speed_kmh[perm], cursor),
            "pos": _dus(ax["pos"], flat(outs["pos"])[perm], cursor),
            "yaw": _dus(ax["yaw"], flat(outs["yaw"])[perm], cursor),
            "obstacle_dist": _dus(ax["obstacle_dist"],
                                  flat(outs["obstacle_dist"])[perm], cursor),
            "tl_state": _dus(ax["tl_state"],
                             flat(outs["tl_state"]).astype(jnp.int32)[perm], cursor),
            "env": _dus(ax["env"], env_ids[perm], cursor),
            "tick": _dus(ax["tick"], (base_tick + tick_ids)[perm], cursor),
        }
        return tbl2, ax2, fl2, cursor + jnp.sum(keep.astype(jnp.int32))

    # Logical rows per page: every non-final page holds exactly page_rows
    # (the route g -> (g // page_rows, g % page_rows) depends on this); the
    # final page holds the remainder.
    def _logical(p: int) -> int:
        return page_rows if p < num_pages - 1 else N - (num_pages - 1) * page_rows

    # Fresh-world SESSIONS, one per page (default for multi-page tables):
    # the reference's own 176K dataset is FIVE independent sessions, not one
    # continuous run, and the round-5/6 forensics isolated the >150k training
    # collapse to frames collected past ~470 s of continuous sim time — rows
    # whose labels are structurally identical (runs/label_structure.json) and
    # individually predictable (runs/cross_eval.json) yet degrade turn
    # training (runs/row_region.json). Restarting the world at each page
    # boundary keeps every row inside the proven-healthy early-sim-time
    # regime AND adds scenario diversity (new NPC placements / route pools
    # per session). Single-page collections are bit-identical to the old
    # behavior. CILRS_TPU_CONTINUOUS_COLLECT=1 restores the old continuous
    # multi-page run (forensics A/B arm).
    fresh_sessions = (
        num_pages > 1
        and os.environ.get("CILRS_TPU_CONTINUOUS_COLLECT") != "1")

    cursor = jnp.asarray(0, jnp.int32)
    t0 = time.time()
    chunks = 0
    session_chunks = 0  # chunks within the current session (tick provenance)
    max_chunks = 20 * (N // M + 1) + 20 * num_pages
    filled = 0
    while filled < N:
        table, aux, fleet, cursor = chunk(
            table, aux, fleet, pool_stack, cursor,
            jnp.asarray(session_chunks * chunk_steps, jnp.int32))
        if chunks == 0:
            jax.block_until_ready(cursor)
            compile_s = time.time() - t0
            if verbose:
                print(f"  resident-collect compile+first chunk: "
                      f"{compile_s:.1f}s", flush=True)
            t0 = time.time()  # steady-state rates exclude the compile
            filled0 = int(cursor)
        chunks += 1
        session_chunks += 1
        if chunks >= max_chunks:
            raise RuntimeError(
                f"collection stalled: {filled}/{N} frames after {chunks} chunks "
                f"(fleet mostly stationary or in recovery?)")
        # One scalar sync per chunk (~5 ms tunnel RTT vs ~0.3 s of device work).
        local = int(cursor)
        if local >= page_rows and len(done_pages) < num_pages - 1:
            # Page full: the (< M) overshoot rows past page_rows are dropped
            # and collection rolls into a fresh page (same shapes — the
            # compiled chunk program is reused as-is). NOTE the drop breaks
            # the same-seed "smaller collection is a bit-identical row-prefix
            # of a larger one" oracle at each boundary (tools/exp_checksum.py)
            # and slightly overstates keep_fraction/frames_per_sec.
            if verbose:
                print(f"  page {len(done_pages)} full: rolled over, "
                      f"{local - page_rows} overshoot frames dropped", flush=True)
            done_pages.append((table, aux))
            table, aux = _new_page()
            cursor = jnp.asarray(0, jnp.int32)
            local = 0
            if fresh_sessions:
                # New session: fresh world/fleet/routes (seed offset by page),
                # sim clock back to 0. Pools are a traced argument of `chunk`,
                # so the compiled program is reused as-is.
                s = len(done_pages)
                fleet, pool_stack = make_fleet(
                    net, num_envs, num_vehicles, num_pedestrians,
                    np.random.RandomState(seed + 7919 * s),
                    seed + 7919 * s, weather_idx)
                session_chunks = 0
                if verbose:
                    print(f"  session {s + 1}/{num_pages}: fresh world "
                          f"(seed {seed + 7919 * s})", flush=True)
        filled = len(done_pages) * page_rows + min(local, _logical(len(done_pages)))
        if verbose and chunks % 20 == 0:
            fps = filled / max(time.time() - t0, 1e-9)
            print(f"  resident-collect {filled}/{N} frames ({fps:.0f} frames/s)",
                  flush=True)

    all_pages = done_pages + [(table, aux)]
    del done_pages

    # Labels: per-page logical slices, concatenated — device copies for the
    # training gathers (small: ~20 B/row), host copies for the split/sampler,
    # CSV parity, and the noise-floor tooling.
    def _cat_dev(key: str, src: int):
        parts = [all_pages[p][src][key][: _logical(p)]
                 for p in range(num_pages)]
        return parts[0] if num_pages == 1 else jnp.concatenate(parts)

    dev_labels = {k: _cat_dev(k, 0) for k in ("speed", "command", "controls")}
    labels = {k: np.asarray(jax.device_get(v)) for k, v in dev_labels.items()}
    labels.update({
        k: np.concatenate([np.asarray(jax.device_get(
            all_pages[p][1][k][: _logical(p)])) for p in range(num_pages)])
        for k in all_pages[0][1]
    })
    wall = time.time() - t0  # steady-state wall (post first-chunk)
    steady_frames = N - filled0
    steady_steps = (chunks - 1) * M
    cmd_counts = np.bincount(labels["command"], minlength=4)
    stats = {
        "frames": N,
        "command_distribution": {COMMAND_NAMES[i]: int(cmd_counts[i]) for i in range(4)},
        "compile_s": compile_s,
        "wall_time_s": wall + compile_s,
        "frames_per_sec": steady_frames / max(wall, 1e-9),
        "env_steps": chunks * M,
        "env_steps_per_sec": steady_steps / max(wall, 1e-9),
        "sim_hz": steady_frames / max(DT * chunk_steps * (chunks - 1), 1e-9),
        "keep_fraction": N / max(chunks * M, 1),
        "num_pages": num_pages,
        "page_rows": page_rows,
    }
    table = {
        "images": tuple(all_pages[p][0]["images"] for p in range(num_pages)),
        **dev_labels,
        "page_rows": page_rows,
        "image_shape": (H, W, 3),
    }

    if output_dir is not None:
        _write_session_csv(output_dir, labels, stats, num_envs, weather_idx)
    if verbose:
        print(f"  resident-collect done: {N} frames in {wall:.1f}s "
              f"({stats['frames_per_sec']:.0f} frames/s, "
              f"{stats['env_steps_per_sec']:.0f} env-steps/s)", flush=True)
    return table, labels, stats


def unwrap_monolithic(table: dict) -> dict:
    """Rebind table["images"] from a 1-page tuple to the bare page array.

    For the diagnostic tools (tools/exp_*), which poke at raw row offsets of
    a single physical table; production consumers take the paged tuple.
    """
    (page,) = table["images"]
    table = dict(table)
    table["images"] = page
    return table


def labels_dataset(labels: dict):
    """Host-label view as a DriveDataset (images=None) for the split/sampler."""
    from cilrs_tpu.data.dataset import DriveDataset

    return DriveDataset(
        images=None,
        speed_norm=labels["speed"],
        command=labels["command"],
        controls=labels["controls"],
    )


def _write_session_csv(output_dir: str, labels: dict, stats: dict,
                       num_envs: int, weather_idx: int | None):
    """measurements.csv / aux.csv / summary.txt parity minus the image bytes
    (collect_data.py:549-564, :774-818)."""
    import csv

    os.makedirs(output_dir, exist_ok=True)
    now = time.time()
    n = stats["frames"]
    with open(os.path.join(output_dir, "measurements.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([
            "frame", "image_filename", "steer", "throttle", "brake", "speed_kmh",
            "speed_normalized", "high_level_command", "command_name",
            "position_x", "position_y", "position_z", "yaw", "timestamp",
        ])
        ct, sp, cm = labels["controls"], labels["speed_kmh"], labels["command"]
        po, yw = labels["pos"], labels["yaw"]
        for k in range(n):
            w.writerow([
                k, f"resident#{k}",
                f"{ct[k, 0]:.6f}", f"{ct[k, 1]:.6f}", f"{ct[k, 2]:.6f}",
                f"{sp[k]:.3f}", f"{labels['speed'][k]:.6f}",
                int(cm[k]), COMMAND_NAMES[int(cm[k])],
                f"{po[k, 0]:.3f}", f"{po[k, 1]:.3f}", "0.000",
                f"{np.degrees(yw[k]):.3f}", f"{now:.3f}",
            ])
    with open(os.path.join(output_dir, "aux.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "obstacle_dist", "tl_state", "env", "tick"])
        for k in range(n):
            w.writerow([k, f"{labels['obstacle_dist'][k]:.3f}",
                        int(labels["tl_state"][k]),
                        int(labels["env"][k]), int(labels["tick"][k])])
    wname = "mixed" if weather_idx is None else WEATHER_NAMES[weather_idx]
    lines = [
        "=" * 50,
        "DATA COLLECTION SUMMARY (resident)",
        "=" * 50,
        f"Frames: {n}",
        f"Weather: {wname}",
        f"Envs: {num_envs}",
        f"Wall time: {stats['wall_time_s']:.1f}s "
        f"({stats['frames_per_sec']:.0f} frames/s)",
        f"Sim rate: {stats['sim_hz']:.0f} Hz aggregate",
        "",
        "Command distribution:",
    ]
    for name, c in stats["command_distribution"].items():
        lines.append(f"  {name}: {c} ({100.0 * c / max(n, 1):.1f}%)")
    with open(os.path.join(output_dir, "summary.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
