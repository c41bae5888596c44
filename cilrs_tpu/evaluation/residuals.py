"""Residual analysis: where does the remaining BC loss live?

Rolls a fresh collect-mode fleet (teacher labels + privileged state the model
never sees: obstacle distance, traffic-light state), predicts with a trained
checkpoint, and breaks the per-control residuals down by regime. This is the
diagnostic loop behind closing the gap to the reference's offline metrics
(/root/reference/evaluation_report.json: throttle MAE 0.017, corr 0.959).

    python -m cilrs_tpu.evaluation.residuals --checkpoint runs/r2f --frames 20000
"""

from __future__ import annotations

import argparse
import functools

import numpy as np


def collect_with_privileged(net, num_frames: int, num_envs: int = 32,
                            num_vehicles: int = 12, num_pedestrians: int = 6,
                            seed: int = 123, chunk_steps: int = 50):
    """Fresh labeled frames + privileged features, mixed weathers."""
    import jax
    import jax.numpy as jnp

    from cilrs_tpu.agent.driver import make_driver_state, rollout
    from cilrs_tpu.agent.scenario import spawn_world
    from cilrs_tpu.config import load_weather_table
    from cilrs_tpu.core.state import default_vehicle_params
    from cilrs_tpu.maps.network import host_arrays
    from cilrs_tpu.maps.routing import chained_route_pool
    from cilrs_tpu.agent.controller import ST_OK

    rng = np.random.RandomState(seed)
    wt = load_weather_table()
    params = default_vehicle_params()
    h = host_arrays(net)
    pools, states = [], []
    for e in range(num_envs):
        pool, meta = chained_route_pool(net, rng, num_routes=4, min_dist=60.0,
                                        max_dist=280.0, with_meta=True)
        world = spawn_world(net, num_vehicles, num_pedestrians, rng,
                            weather_idx=e % 5, seed=seed + e)
        sw = meta["start_wps"][0]
        world = world.replace(
            veh_pos=world.veh_pos.at[0].set(jnp.asarray(h.wp_xy[sw])),
            veh_yaw=world.veh_yaw.at[0].set(float(h.wp_yaw[sw])),
            rng=jax.random.PRNGKey(seed * 31 + e),
        )
        pools.append(pool)
        states.append(make_driver_state(world))
    pool_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pools)
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(st):
        def one(s, p):
            return rollout(s, steps=chunk_steps, net=net, pool=p, wt=wt,
                           params=params, policy_fn=None, mode="collect",
                           want_frames=True)
        return jax.vmap(one)(st, pool_stack)

    cols = {k: [] for k in ("frame", "control", "speed_kmh", "command",
                            "obstacle_dist", "tl_state", "weather")}
    total = 0
    while total < num_frames:
        fleet, outs = chunk(fleet)
        ok = (np.asarray(outs["speed_kmh"]) > 0.5) & (
            np.asarray(outs["status"]) == ST_OK)
        E, T = ok.shape
        weather = np.broadcast_to(
            (np.arange(E) % 5)[:, None], (E, T))
        sel = ok.reshape(-1)
        flat = lambda x: np.asarray(x).reshape((E * T,) + np.asarray(x).shape[2:])
        for k in ("frame", "control", "speed_kmh", "command",
                  "obstacle_dist", "tl_state"):
            cols[k].append(flat(outs[k])[sel])
        cols["weather"].append(weather.reshape(-1)[sel])
        total += int(sel.sum())
    return {k: np.concatenate(v)[:num_frames] for k, v in cols.items()}


def predict(ckpt_dir: str, frames: np.ndarray, speed_kmh: np.ndarray,
            command: np.ndarray, batch: int = 256):
    import jax
    import jax.numpy as jnp

    import dataclasses

    from cilrs_tpu.config import SPEED_NORM_FACTOR, load_train_config
    from cilrs_tpu.ops.image import normalize
    from cilrs_tpu.train.checkpoint import payload_speed_skip, restore_best_payload
    from cilrs_tpu.train.state import create_train_state

    cfg = load_train_config()
    payload = restore_best_payload(ckpt_dir)
    ss = payload_speed_skip(payload)  # match legacy checkpoints (advisor r2)
    if ss != cfg.model.speed_skip:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, speed_skip=ss))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"])

    @jax.jit
    def fwd(img, sp, cm):
        x = normalize(img.astype(jnp.float32) / 255.0)
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, sp, cm, train=False)

    n = len(frames)
    pad = (-n) % batch
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    preds, pspeeds = [], []
    sp_norm = np.clip(speed_kmh / SPEED_NORM_FACTOR, 0.0, 1.0).astype(np.float32)
    for i in range(0, len(idx), batch):
        j = idx[i:i + batch]
        c, ps = fwd(frames[j], sp_norm[j], command[j])
        preds.append(np.asarray(c))
        pspeeds.append(np.asarray(ps))
    return np.concatenate(preds)[:n], np.concatenate(pspeeds)[:n]


def breakdown(data, pred, pred_speed):
    from cilrs_tpu.config import SPEED_NORM_FACTOR

    lab = data["control"]
    res = np.abs(pred - lab)  # [N,3]
    sp_norm = np.clip(data["speed_kmh"] / SPEED_NORM_FACTOR, 0, 1)
    out = {}

    def corr(a, b):
        if a.std() < 1e-9 or b.std() < 1e-9:
            return float("nan")
        return float(np.corrcoef(a, b)[0, 1])

    out["n"] = len(lab)
    out["mae"] = {k: float(res[:, i].mean())
                  for i, k in enumerate(("steer", "throttle", "brake"))}
    out["corr"] = {k: corr(pred[:, i], lab[:, i])
                   for i, k in enumerate(("steer", "throttle", "brake"))}
    out["corr"]["speed"] = corr(pred_speed, sp_norm)
    out["speed_mae"] = float(np.abs(pred_speed - sp_norm).mean())

    def seg(name, mask):
        if mask.sum() == 0:
            return
        out.setdefault("segments", {})[name] = {
            "frac": round(float(mask.mean()), 4),
            "steer_mae": round(float(res[mask, 0].mean()), 4),
            "throttle_mae": round(float(res[mask, 1].mean()), 4),
            "brake_mae": round(float(res[mask, 2].mean()), 4),
        }

    th = lab[:, 1]
    seg("th_plateau_hi", th > 0.61)
    seg("th_zero", th < 0.01)
    seg("th_band", (th >= 0.01) & (th <= 0.61))
    seg("gated_obstacle", data["obstacle_dist"] < 25.0)
    seg("free_road", data["obstacle_dist"] >= 25.0)
    seg("red_or_yellow", data["tl_state"] >= 1)
    seg("big_steer", np.abs(lab[:, 0]) > 0.3)
    seg("small_steer", np.abs(lab[:, 0]) <= 0.3)
    for w, nm in enumerate(("clear", "rain", "fog", "night", "hardrain")):
        seg(f"weather_{nm}", data["weather"] == w)
    for c, nm in enumerate(("FOLLOW", "LEFT", "RIGHT", "STRAIGHT")):
        seg(f"cmd_{nm}", data["command"] == c)
    # loss-weighted contribution of each throttle segment
    return out


def main(argv=None):
    from cilrs_tpu.cli.common import (
        build_map, enable_compilation_cache, require_accelerator)
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--frames", type=int, default=20000)
    p.add_argument("--envs", type=int, default=32)
    p.add_argument("--map", default="town01")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    net = build_map(args.map)
    data = collect_with_privileged(net, args.frames, num_envs=args.envs,
                                   seed=args.seed)
    pred, pred_speed = predict(args.checkpoint, data["frame"],
                               data["speed_kmh"], data["command"])
    rep = breakdown(data, pred, pred_speed)
    import json
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
    return rep


if __name__ == "__main__":
    main()
