"""Fused on-device collect -> train: frames never leave the TPU.

BASELINE.json config 5 ("fused rollout+train loop: parallel data collection
feeding on-TPU CILRS training"). A fleet of autopilot envs streams rendered
frames + labels into a device-resident uint8 ring buffer; train steps sample
from the buffer directly. The host only dispatches and reads scalar losses —
there is no frame transfer at all (the reference writes every frame to disk in
its 20 Hz loop, collect_data.py:685-716, then reads them back in DataLoader
workers).

Oversampling parity: the notebook's WeightedRandomSampler equalizes command
frequencies; here the equivalent inverse-frequency weighting is applied to the
per-sample loss using running command counts maintained on device.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from cilrs_tpu.agent.controller import ST_OK
from cilrs_tpu.agent.driver import DT, env_step, make_driver_state
from cilrs_tpu.agent.scenario import spawn_world
from cilrs_tpu.config import SPEED_NORM_FACTOR, TrainConfig, load_weather_table
from cilrs_tpu.core.state import default_vehicle_params
from cilrs_tpu.maps.network import RoadNetwork, host_arrays
from cilrs_tpu.maps.routing import RoutePool, chained_route_pool
from cilrs_tpu.models.losses import cilrs_loss
from cilrs_tpu.ops.image import augment_batch, normalize
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.render.raster import CAMERA
from cilrs_tpu.train.state import CILRSTrainState, create_train_state


@struct.dataclass
class ReplayBuffer:
    """Device-resident ring buffer of labeled frames."""

    images: jnp.ndarray  # [N, H, W, 3] uint8
    speed: jnp.ndarray  # [N] f32 normalized
    command: jnp.ndarray  # [N] i32
    controls: jnp.ndarray  # [N, 3] f32
    valid: jnp.ndarray  # [N] bool
    cursor: jnp.ndarray  # scalar i32
    total_written: jnp.ndarray  # scalar i32
    filled: jnp.ndarray  # scalar i32 — slots ever written, capped at N
    cmd_counts: jnp.ndarray  # [4] f32 — running command histogram


def make_buffer(capacity: int, h: int, w: int) -> ReplayBuffer:
    return ReplayBuffer(
        images=jnp.zeros((capacity, h, w, 3), jnp.uint8),
        speed=jnp.zeros((capacity,), jnp.float32),
        command=jnp.zeros((capacity,), jnp.int32),
        controls=jnp.zeros((capacity, 3), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        cursor=jnp.asarray(0, jnp.int32),
        total_written=jnp.asarray(0, jnp.int32),
        filled=jnp.asarray(0, jnp.int32),
        cmd_counts=jnp.ones((4,), jnp.float32),
    )


def write_chunk(buf: ReplayBuffer, frames, speed_kmh, command, controls, moving):
    """Append a flattened chunk [M, ...] at the cursor (ring semantics).

    Stationary frames are written but marked invalid (reference skips them,
    collect_data.py:678-679) — static shapes require masked writes.
    """
    M = frames.shape[0]
    N = buf.images.shape[0]
    idx = (buf.cursor + jnp.arange(M)) % N
    speed_norm = jnp.clip(speed_kmh / SPEED_NORM_FACTOR, 0.0, 1.0)
    onehot = jax.nn.one_hot(command, 4, dtype=jnp.float32) * moving[:, None].astype(jnp.float32)
    return buf.replace(
        images=buf.images.at[idx].set(frames),
        speed=buf.speed.at[idx].set(speed_norm),
        command=buf.command.at[idx].set(command),
        controls=buf.controls.at[idx].set(controls),
        valid=buf.valid.at[idx].set(moving),
        cursor=(buf.cursor + M) % N,
        total_written=buf.total_written + jnp.sum(moving.astype(jnp.int32)),
        filled=jnp.minimum(buf.filled + M, N),
        cmd_counts=buf.cmd_counts + jnp.sum(onehot, axis=0),
    )


def snapshot_val_slice(buf: ReplayBuffer, size: int):
    """Snapshot the freshest `size` frames of a ring as a validation set."""
    N = buf.images.shape[0]
    idx = (buf.cursor - size + jnp.arange(size)) % N
    return {
        "images": buf.images[idx],
        "speed": buf.speed[idx],
        "command": buf.command[idx],
        "controls": buf.controls[idx],
        "valid": buf.valid[idx],
    }


def freeze_val_slice(buf: ReplayBuffer, size: int):
    """snapshot_val_slice + mark those entries invalid in the ring (for when
    the val slice is carved out of the training stream). Returns (buf', val)."""
    N = buf.images.shape[0]
    idx = (buf.cursor - size + jnp.arange(size)) % N
    return buf.replace(valid=buf.valid.at[idx].set(False)), snapshot_val_slice(buf, size)


def sample_batch(buf: ReplayBuffer, key: jnp.ndarray, batch: int):
    """Uniform over valid written entries + inverse-command-frequency loss
    weights. Draws are bounded to the written region of the ring (never the
    zero-initialized tail), invalid picks (stationary / held-out frames) are
    re-drawn a few times, and any survivors are zero-weighted."""
    hi = jnp.maximum(buf.filled, 1)
    idx = jax.random.randint(key, (batch,), 0, hi)
    for r in range(1, 4):  # geometric best-effort; invalid fraction is small
        alt = jax.random.randint(jax.random.fold_in(key, r), (batch,), 0, hi)
        idx = jnp.where(buf.valid[idx], idx, alt)
    ok = buf.valid[idx]
    freq = buf.cmd_counts / jnp.sum(buf.cmd_counts)
    w = (1.0 / jnp.maximum(freq[buf.command[idx]], 1e-6))
    w = w / jnp.mean(w) * ok.astype(jnp.float32)
    return {
        "images": buf.images[idx],
        "speed": buf.speed[idx],
        "command": buf.command[idx],
        "controls": buf.controls[idx],
        "weights": w,
    }


def weighted_train_step(cfg: TrainConfig, axis_name: str | None = None):
    """Per-sample-weighted train step. With `axis_name` (inside shard_map /
    pmap) gradients and batch stats are pmean'd across the mesh — the classic
    DP all-reduce riding ICI."""
    loss_cfg = cfg.loss

    def step(state: CILRSTrainState, batch, rng):
        aug_key, drop_key = jax.random.split(jax.random.fold_in(rng, state.step))
        x = batch["images"].astype(jnp.float32) / 255.0
        x = augment_batch(aug_key, x)
        x = normalize(x)
        w = batch["weights"]

        def loss_fn(params):
            (controls, pred_speed), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, batch["speed"], batch["command"], train=True,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            l1 = jnp.abs(controls - batch["controls"])
            per = (loss_cfg.steer_weight * l1[:, 0]
                   + loss_cfg.throttle_weight * l1[:, 1]
                   + loss_cfg.brake_weight * l1[:, 2]
                   + loss_cfg.speed_weight * (pred_speed - batch["speed"]) ** 2)
            total = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-6)
            # Unweighted loss for comparability with the reference's val metric.
            plain, _ = cilrs_loss(controls, pred_speed, batch["controls"],
                                  batch["speed"], loss_cfg)
            return total, (plain, mutated["batch_stats"])

        (loss, (plain, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            plain = jax.lax.pmean(plain, axis_name)
        return state.apply_gradients(grads, new_stats), {
            "loss": loss, "plain_loss": plain,
        }

    return step


def buffer_pspecs():
    """shard_map partition specs for a ReplayBuffer: rows over the data axis,
    ring bookkeeping replicated (every device writes the same number of local
    rows per chunk, so the local cursor stays in lockstep)."""
    from jax.sharding import PartitionSpec as P

    from cilrs_tpu.parallel.mesh import DATA_AXIS

    row, rep = P(DATA_AXIS), P()
    return ReplayBuffer(
        images=row, speed=row, command=row, controls=row, valid=row,
        cursor=rep, total_written=rep, filled=rep, cmd_counts=rep,
    )


def fused_collect_train(
    net: RoadNetwork,
    cfg: TrainConfig | None = None,
    num_envs: int = 32,
    num_vehicles: int = 12,
    num_pedestrians: int = 6,
    buffer_frames: int = 65_536,
    collect_ticks: int = 20,
    train_steps_per_chunk: int = 4,
    total_train_steps: int = 2_000,
    warmup_chunks: int = 24,
    settle_fraction: float = 0.25,
    seed: int = 0,
    cam: CameraSpec = CAMERA,
    eval_every: int = 200,
    verbose: bool = True,
    mesh=None,
) -> dict[str, Any]:
    """Run the fused loop. Returns {state, history, frames_collected, ...}.

    With `mesh` (a jax.sharding.Mesh over the data axis), the fleet and the
    ring buffer shard over devices via shard_map: collection is local per
    device (each shard owns its envs and its ring region — zero collectives),
    training is classic DP (local batch, pmean'd gradients over ICI). This is
    the distributed story SURVEY.md §7.8 calls for, replacing the reference's
    CARLA client/server RPC seam."""
    cfg = cfg or TrainConfig()
    rng = np.random.RandomState(seed)
    wt_ = load_weather_table()
    params = default_vehicle_params()
    hn = host_arrays(net)

    # Fleet setup: per-env chained routes, mixed weathers. The ego MUST start
    # at its route's start waypoint — spawning elsewhere produces off-route
    # pure-pursuit labels (clipped hard turns toward a distant route) that
    # poison the early dataset.
    pools, states = [], []
    for e in range(num_envs):
        pool, meta = chained_route_pool(net, rng, num_routes=4, min_dist=60.0,
                                        max_dist=280.0, with_meta=True)
        world = spawn_world(net, num_vehicles, num_pedestrians, rng,
                            weather_idx=e % 5, seed=seed + e)
        start_wp = meta["start_wps"][0]
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(hn.wp_xy[start_wp])),
            veh_yaw=world.veh_yaw.at[0].set(float(hn.wp_yaw[start_wp])),
            rng=jax.random.PRNGKey(seed * 997 + e),
        )
        pools.append(pool)
        states.append(make_driver_state(world))
    pool_stack: RoutePool = jax.tree.map(lambda *xs: jnp.stack(xs), *pools)
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    # Independent validation stream: a SECOND fleet (disjoint seed + routes,
    # same shapes so it reuses the compiled collect kernel) fills its own small
    # ring and is then discarded. Holding out a slice of the train stream's
    # warmup instead is subtly wrong twice over: the warmup distribution is a
    # young synchronized fleet (unrepresentative), and the early "holdout"
    # numbers track train-set frames until the ring recycles them.
    vrng = np.random.RandomState(seed + 10_000)
    vpools, vstates = [], []
    for e in range(num_envs):
        pool, meta = chained_route_pool(net, vrng, num_routes=4, min_dist=60.0,
                                        max_dist=280.0, with_meta=True)
        world = spawn_world(net, num_vehicles, num_pedestrians, vrng,
                            weather_idx=e % 5, seed=seed + 10_000 + e)
        start_wp = meta["start_wps"][0]
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(hn.wp_xy[start_wp])),
            veh_yaw=world.veh_yaw.at[0].set(float(hn.wp_yaw[start_wp])),
            rng=jax.random.PRNGKey(seed * 1013 + e + 7),
        )
        vpools.append(pool)
        vstates.append(make_driver_state(world))
    vpool_stack: RoutePool = jax.tree.map(lambda *xs: jnp.stack(xs), *vpools)
    vfleet = jax.tree.map(lambda *xs: jnp.stack(xs), *vstates)

    buf = make_buffer(buffer_frames, cam.height, cam.width)
    tstate = create_train_state(
        cfg, jax.random.PRNGKey(seed),
        steps_per_epoch=max(total_train_steps // cfg.training.epochs, 1),
        schedule="cosine", total_steps=total_train_steps,
    )
    B = cfg.training.batch_size
    # Polyak average of the params for evaluation/deployment: the streaming
    # gradient noise makes the raw-iterate holdout loss swing by +-0.02 between
    # evals; the EMA iterate is both steadier and measurably better.
    # (jnp.copy: tstate is DONATED into the first train_chunk, which would
    # invalidate an aliased initial EMA tree.) Params AND batch stats are
    # averaged together: pairing averaged params with the latest BatchNorm
    # running stats is inconsistent and measurably corrupts the eval.
    ema = jax.tree.map(jnp.copy, {"params": tstate.params,
                                  "batch_stats": tstate.batch_stats})
    ema_decay = 0.999 ** train_steps_per_chunk  # one EMA update per chunk

    @jax.jit
    def ema_update(e, cur, d):
        return jax.tree.map(lambda a, b: d * a + (1.0 - d) * b, e, cur)

    def _collect_body(fl, b, net_, pools_):
        def one(s, p):
            def body(c, _):
                c2, out = env_step(c, net_, p, wt_, params, None, mode="collect",
                                   cam=cam, want_frame=True)
                return c2, out
            return jax.lax.scan(body, s, None, length=collect_ticks)

        fl2, outs = jax.vmap(one)(fl, pools_)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        # Label hygiene: only NOMINAL frames become training data. Recovery
        # episodes steer by a pseudo-random hash (driver.py rsteer) — recording
        # them hands BC unlearnable steer labels (the reference's dataset never
        # contains them: CARLA's autopilot has no recovery mode).
        nominal = flat(outs["status"]) == ST_OK
        b2 = write_chunk(
            b, flat(outs["frame"]), flat(outs["speed_kmh"]),
            flat(outs["command"]), flat(outs["control"]),
            (flat(outs["speed_kmh"]) > 0.5) & nominal,
        )
        return fl2, b2

    def _train_body(ts, b, key, step_fn, batch_size):
        def body(carry, k):
            ts_, _ = carry
            batch = sample_batch(b, k, batch_size)
            ts2, parts = step_fn(ts_, batch, k)
            return (ts2, parts["plain_loss"]), None
        keys = jax.random.split(key, train_steps_per_chunk)
        (ts2, last_loss), _ = jax.lax.scan(body, (ts, jnp.asarray(0.0)), keys)
        return ts2, last_loss

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cilrs_tpu.parallel.mesh import DATA_AXIS, shard_map_compat

        assert num_envs % n_dev == 0, (num_envs, n_dev)
        assert buffer_frames % n_dev == 0, (buffer_frames, n_dev)
        row, rep = P(DATA_AXIS), P()
        bspecs = buffer_pspecs()
        step_fn = weighted_train_step(cfg, axis_name=DATA_AXIS)
        B_local = max(B // n_dev, 1)

        def collect_local(fl, b, net_, pools_):
            fl2, b2 = _collect_body(fl, b, net_, pools_)
            # Ring writes and the cursor are shard-local; make the global
            # counters global with a psum of the local increments.
            d_tw = b2.total_written - b.total_written
            d_cc = b2.cmd_counts - b.cmd_counts
            return fl2, b2.replace(
                total_written=b.total_written + jax.lax.psum(d_tw, DATA_AXIS),
                cmd_counts=b.cmd_counts + jax.lax.psum(d_cc, DATA_AXIS),
            )

        def train_local(ts, b, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            return _train_body(ts, b, key, step_fn, B_local)

        collect_chunk = jax.jit(
            shard_map_compat(collect_local, mesh,
                             in_specs=(row, bspecs, rep, row),
                             out_specs=(row, bspecs)),
            donate_argnums=(0, 1),
        )
        train_chunk_sharded = jax.jit(
            shard_map_compat(train_local, mesh,
                             in_specs=(rep, bspecs, rep),
                             out_specs=(rep, rep)),
            donate_argnums=0,
        )
        train_chunk = lambda ts, b, key, _net: train_chunk_sharded(ts, b, key)

        V_local_total = (min(4096, buffer_frames // 4) // (B * n_dev)) * B
        snapshot_fn = jax.jit(
            shard_map_compat(
                functools.partial(snapshot_val_slice, size=max(V_local_total, B)),
                mesh, in_specs=(bspecs,),
                out_specs={k: row for k in
                           ("images", "speed", "command", "controls", "valid")},
            )
        )

        def shard_tree(tree, spec_tree):
            to_sharding = lambda s: NamedSharding(mesh, s)
            if isinstance(spec_tree, P):
                return jax.device_put(tree, to_sharding(spec_tree))
            return jax.tree.map(
                lambda x, s: jax.device_put(x, to_sharding(s)), tree, spec_tree,
                is_leaf=lambda x: x is None,
            )

        fleet = shard_tree(fleet, row)
        pool_stack = shard_tree(pool_stack, row)
        buf = shard_tree(buf, bspecs)
        tstate = shard_tree(tstate, rep)
        vfleet = shard_tree(vfleet, row)
        vpool_stack = shard_tree(vpool_stack, row)
        shard_buf = lambda b: shard_tree(b, bspecs)
    else:
        collect_chunk = jax.jit(_collect_body, donate_argnums=(0, 1))
        train_step = weighted_train_step(cfg)

        @functools.partial(jax.jit, donate_argnums=0)
        def train_chunk(ts, b, key, net_unused):
            return _train_body(ts, b, key, train_step, B)

        snapshot_fn = None
        shard_buf = lambda b: b

    @jax.jit
    def eval_loss(ts, ema_, val):
        """Loss over the frozen validation slice (masked by validity), with the
        EMA params+stats. Returns [5]: total, and the weighted steer/throttle/
        brake/speed terms — the breakdown shows where residual loss lives."""
        def body(carry, sl):
            x = normalize(sl["images"].astype(jnp.float32) / 255.0)
            controls, pred_speed = ts.apply_fn(
                {"params": ema_["params"], "batch_stats": ema_["batch_stats"]},
                x, sl["speed"], sl["command"], train=False,
            )
            l1 = jnp.abs(controls - sl["controls"])
            terms = jnp.stack([
                cfg.loss.steer_weight * l1[:, 0],
                cfg.loss.throttle_weight * l1[:, 1],
                cfg.loss.brake_weight * l1[:, 2],
                cfg.loss.speed_weight * (pred_speed - sl["speed"]) ** 2,
            ])  # [4, B]
            m = sl["valid"].astype(jnp.float32)
            s, c = carry
            return (s + jnp.sum(terms * m[None, :], axis=1), c + jnp.sum(m)), None

        batched = jax.tree.map(
            lambda x: x.reshape((-1, B) + x.shape[1:]), val)
        (s, c), _ = jax.lax.scan(body, (jnp.zeros(4), jnp.asarray(0.0)), batched)
        terms = s / jnp.maximum(c, 1.0)
        return jnp.concatenate([jnp.sum(terms)[None], terms])

    history = []
    key = jax.random.PRNGKey(seed + 7)
    t0 = time.time()
    # Warmup: fill the buffer before training starts.
    for _ in range(warmup_chunks):
        fleet, buf = collect_chunk(fleet, buf, net, pool_stack)
    frames0 = int(buf.total_written)
    if verbose:
        print(f"  warmup: {frames0} frames in {time.time()-t0:.1f}s "
              f"({frames0/max(time.time()-t0,1e-9):,.0f} frames/s)", flush=True)

    # Held-out validation: mature the INDEPENDENT val fleet (same compiled
    # collect kernel — identical shapes), then snapshot the freshest V frames
    # of its private ring. Training never touches this stream, and the frames
    # reflect a mature mixed-traffic fleet, not the synchronized warmup.
    # Clamp to at least one batch: B > buffer/4 would otherwise floor V to 0
    # and every holdout metric would silently evaluate to 0 (advisor r2).
    V = max((min(4096, buffer_frames // 4) // B) * B, B)
    vbuf = shard_buf(make_buffer(buffer_frames, cam.height, cam.width))
    val_chunks = max(warmup_chunks,
                     (2 * V) // max(num_envs * collect_ticks, 1) + 1)
    for _ in range(val_chunks):
        vfleet, vbuf = collect_chunk(vfleet, vbuf, net, vpool_stack)
    if snapshot_fn is not None:
        val_set = snapshot_fn(vbuf)
    else:
        val_set = jax.jit(functools.partial(snapshot_val_slice, size=V))(vbuf)
    val_set = jax.tree.map(lambda x: x.block_until_ready(), val_set)
    del vbuf, vfleet  # free the 3-ish GB val ring before training starts

    # Settle tail: the streaming phase is effectively one-pass (each frame is
    # sampled ~train_steps_per_chunk*B/chunk_frames times before the ring
    # recycles it), which underfits relative to the multi-epoch offline path —
    # r2's fused holdout plateaued at 0.166 vs 0.131 disk-trained on the same
    # data distribution. The last settle_fraction of the step budget freezes
    # collection and keeps training on the final ring (a bounded multi-epoch
    # pass over the freshest buffer_frames), with the cosine schedule riding
    # to its end value as usual.
    stream_steps = int(total_train_steps * (1.0 - settle_fraction))
    steps_done = 0
    t1 = time.time()
    while steps_done < total_train_steps:
        if steps_done < stream_steps:
            fleet, buf = collect_chunk(fleet, buf, net, pool_stack)
        key, k = jax.random.split(key)
        tstate, loss = train_chunk(tstate, buf, k, None)
        # Ramped decay (min(d, (1+n)/(10+n))): the average forgets the random
        # init quickly instead of carrying its bias for ~1/(1-d) chunks.
        n_chunk = steps_done // train_steps_per_chunk + 1
        d = min(ema_decay, (1.0 + n_chunk) / (10.0 + n_chunk))
        ema = ema_update(ema, {"params": tstate.params,
                               "batch_stats": tstate.batch_stats}, d)
        steps_done += train_steps_per_chunk
        if steps_done % eval_every < train_steps_per_chunk:
            terms = np.asarray(eval_loss(tstate, ema, val_set))
            raw = np.asarray(eval_loss(
                tstate, {"params": tstate.params,
                         "batch_stats": tstate.batch_stats}, val_set))
            vl = float(terms[0])
            history.append({
                "step": steps_done, "val_loss": vl,
                "val_steer": float(terms[1]), "val_throttle": float(terms[2]),
                "val_brake": float(terms[3]), "val_speed": float(terms[4]),
                "raw_val_loss": float(raw[0]), "raw_val_steer": float(raw[1]),
                "frames": int(buf.total_written),
                "time_s": time.time() - t1,
            })
            history[-1]["train_loss"] = float(loss)
            if verbose:
                print(f"  step {steps_done}: holdout loss {vl:.4f} "
                      f"[st {terms[1]:.3f} th {terms[2]:.3f} "
                      f"br {terms[3]:.3f} sp {terms[4]:.3f}] "
                      f"raw {raw[0]:.4f} [st {raw[1]:.3f}] "
                      f"(train {float(loss):.4f}, "
                      f"{int(buf.total_written):,} frames seen, {time.time()-t1:.0f}s)",
                      flush=True)

    wall = time.time() - t1
    # Deploy the EMA iterate: it is what the holdout numbers were measured on.
    tstate = tstate.replace(params=ema["params"], batch_stats=ema["batch_stats"])
    return {
        "state": tstate,
        "history": history,
        "frames_collected": int(buf.total_written),
        "train_steps": steps_done,
        "wall_s": wall,
        "frames_per_sec_train": steps_done * B / wall,
    }
