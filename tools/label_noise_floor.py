"""Teacher label-noise floor: the irreducible behavior-cloning error.

A BC model predicting y from observation x can at best achieve
E[ |y - E[y|x]| ]; if the teacher emits different labels from (nearly) the
same state, that variance is unlearnable. We estimate it from collected
sessions by pairing frames whose STATE matches (same command, position within
`pos_tol` m, heading within `yaw_tol` deg, speed within `speed_tol` km/h —
i.e. states that render to near-identical camera frames) and measuring the
mean absolute label difference within pairs. Half the expected |y1-y2| of
matched pairs estimates the MAE floor (for symmetric noise).

Usage: python tools/label_noise_floor.py data/session_* [--steer-min 0.1]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd


def load_sessions(paths):
    dfs = []
    for p in paths:
        csv = os.path.join(p, "measurements.csv")
        if os.path.exists(csv):
            df = pd.read_csv(csv)
            df["session"] = p
            aux = os.path.join(p, "aux.csv")
            if os.path.exists(aux):
                a = pd.read_csv(aux)
                df["obstacle_dist"] = a["obstacle_dist"].to_numpy()
                df["tl_state"] = a["tl_state"].to_numpy()
                if "env" in a.columns:  # resident sessions interleave envs
                    df["env"] = a["env"].to_numpy()
                    df["tick"] = a["tick"].to_numpy()
            dfs.append(df)
    if not dfs:
        sys.exit("no measurements.csv found in given paths")
    return pd.concat(dfs, ignore_index=True)


def match_pairs(df, pos_tol=0.75, yaw_tol=3.0, speed_tol=1.5, max_pairs=200_000):
    """Greedy spatial-hash matching of near-identical states across frames."""
    pos = df[["position_x", "position_y"]].to_numpy()
    yaw = df["yaw"].to_numpy()
    spd = df["speed_kmh"].to_numpy()
    cmd = df["high_level_command"].to_numpy()
    frame = df["frame"].to_numpy()
    sess = df["session"].to_numpy()
    # Gating context (from aux.csv when available): the teacher's throttle and
    # brake condition on obstacle distance and traffic-light state, both of
    # which are OBSERVABLE in the rendered frame — two states only count as
    # "the same" if their gating context matches too, else the measured label
    # difference is learnable signal, not noise.
    has_aux = "obstacle_dist" in df.columns
    if has_aux:
        od = df["obstacle_dist"].to_numpy()
        tl = df["tl_state"].to_numpy()
        od_far = od > 25.0  # beyond any teacher gate at <=30 km/h
    # Resident sessions interleave envs in row order: "the same pass through a
    # state" is same env + nearby tick, not a nearby CSV row (adjacent ticks of
    # one env sit num_envs rows apart and would slip a row-distance exclusion,
    # biasing the floor low with autocorrelated labels).
    has_env = "env" in df.columns
    if has_env:
        env = df["env"].to_numpy()
        tick = df["tick"].to_numpy()

    cell = pos_tol
    keys = np.floor(pos / cell).astype(np.int64)
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    pairs = []
    # Bucket by cell; compare within bucket and the +x neighbor bucket.
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in order:
        buckets[(keys[i, 0], keys[i, 1])].append(i)
    for (kx, ky), idxs in buckets.items():
        cand = list(idxs)
        for nb in ((kx + 1, ky), (kx, ky + 1), (kx + 1, ky + 1)):
            cand += buckets.get(nb, [])
        for a_pos, i in enumerate(idxs):
            for j in cand[a_pos + 1:]:
                if cmd[i] != cmd[j]:
                    continue
                # Same session AND the same pass through this state (labels
                # trivially autocorrelated) — exclude.
                if sess[i] == sess[j]:
                    if has_env:
                        if env[i] == env[j] and abs(int(tick[i]) - int(tick[j])) < 50:
                            continue
                    elif abs(int(frame[i]) - int(frame[j])) < 50:
                        continue
                if np.hypot(*(pos[i] - pos[j])) > pos_tol:
                    continue
                dyaw = abs((yaw[i] - yaw[j] + 180.0) % 360.0 - 180.0)
                if dyaw > yaw_tol or abs(spd[i] - spd[j]) > speed_tol:
                    continue
                if has_aux:
                    if tl[i] != tl[j]:
                        continue
                    if not (od_far[i] and od_far[j]) and abs(od[i] - od[j]) > 1.0:
                        continue
                pairs.append((i, j))
                if len(pairs) >= max_pairs:
                    return np.asarray(pairs)
    return np.asarray(pairs) if pairs else np.zeros((0, 2), np.int64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sessions", nargs="+")
    p.add_argument("--pos-tol", type=float, default=0.75)
    p.add_argument("--yaw-tol", type=float, default=3.0)
    p.add_argument("--speed-tol", type=float, default=1.5)
    args = p.parse_args()

    paths = []
    for s in args.sessions:
        paths += glob.glob(s)
    df = load_sessions(paths)
    print(f"{len(df)} frames from {len(paths)} sessions")

    pairs = match_pairs(df, args.pos_tol, args.yaw_tol, args.speed_tol)
    print(f"{len(pairs)} matched state pairs")
    if len(pairs) == 0:
        return

    labels = df[["steer", "throttle", "brake"]].to_numpy()
    d = np.abs(labels[pairs[:, 0]] - labels[pairs[:, 1]])
    steer_mag = np.maximum(np.abs(labels[pairs[:, 0], 0]),
                           np.abs(labels[pairs[:, 1], 0]))
    big = steer_mag > 0.1

    def report(tag, sel):
        if sel.sum() == 0:
            print(f"  {tag}: no pairs")
            return
        m = d[sel].mean(axis=0) / 2.0  # E|y1-y2|/2 ~ MAE floor
        print(f"  {tag:24s} pairs={int(sel.sum()):7d}  "
              f"steer_floor={m[0]:.4f}  throttle_floor={m[1]:.4f}  "
              f"brake_floor={m[2]:.4f}")

    print("\nestimated per-control BC noise floors (MAE):")
    report("all pairs", np.ones(len(pairs), bool))
    report("big-steer (|s|>0.1)", big)
    report("small-steer", ~big)
    # Loss-floor: 5*L1(steer)+L1(thr)+L1(brk) part of the CILRS loss.
    m = d.mean(axis=0) / 2.0
    print(f"\ncontrols loss floor = 5*{m[0]:.4f} + {m[1]:.4f} + {m[2]:.4f} "
          f"= {5 * m[0] + m[1] + m[2]:.4f}")


if __name__ == "__main__":
    main()
