"""Per-control correlation CEILING of behavior cloning on teacher data.

The judge bars compare against the reference's offline correlations (e.g.
brake corr 0.9815, /root/reference/evaluation_report.json). Whether such a
bar is *reachable* on our self-generated data depends on how much of the
label's variance is a function of the observable state: a BC model computes
pred = f(observation), so

    corr(pred, y) <= sigma_f / sigma_y = sqrt(1 - Var(eps) / Var(y))

where y = f*(state) + eps and Var(eps) is the label variance across
near-identical observable states. We estimate Var(eps) with the same
matched-pair machinery as tools/label_noise_floor.py (same command, position,
heading, speed, traffic-light state and obstacle distance — everything the
rendered frame shows), via E[(y1 - y2)^2] = 2 Var(eps) for independent noise.

The estimate is CONSERVATIVE (a lower bound on the ceiling): any label
difference caused by state the matching does not key on — but the camera does
see, e.g. NPC poses beyond the lead vehicle — is charged to noise.

Usage: python tools/corr_ceiling.py runs/r3h/session_resident \
           [--pos-tol 0.5 --od-tol 0.5]
"""

from __future__ import annotations

import argparse
import glob

import numpy as np

from label_noise_floor import load_sessions, match_pairs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sessions", nargs="+")
    p.add_argument("--pos-tol", type=float, default=0.5)
    p.add_argument("--yaw-tol", type=float, default=2.0)
    p.add_argument("--speed-tol", type=float, default=1.0)
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
    names = ["steer", "throttle", "brake"]
    print("\nper-control correlation ceilings (conservative):")
    for k, name in enumerate(names):
        y = labels[:, k]
        var_y = y.var()
        d2 = (labels[pairs[:, 0], k] - labels[pairs[:, 1], k]) ** 2
        var_eps = d2.mean() / 2.0
        ceil = np.sqrt(max(0.0, 1.0 - var_eps / var_y))
        print(f"  {name:9s} Var(y)={var_y:.5f}  Var(eps)={var_eps:.6f}  "
              f"corr ceiling <= {ceil:.4f}")

    # within-0.01 steer ceiling: even the Bayes predictor E[y|x] misses a
    # frame whose label noise exceeds the band. With eps1 - eps2 observed via
    # matched pairs, P(|y - E[y|x]| <= t) for the optimal predictor is
    # estimated empirically from |y1-y2|/sqrt(2) (independent symmetric noise:
    # |eps| ~ |eps1-eps2|/sqrt(2) in distribution for the Gaussian family;
    # for heavy-tailed noise this is still the right scale factor for the
    # second moment, and we also report the direct P(|y1-y2| <= 2t) bound,
    # which is exact-free of distributional assumptions only as a sanity
    # corridor: P(|eps|<=t)^2 <= P(|y1-y2|<=2t)).
    t = 0.01
    d = np.abs(labels[pairs[:, 0], 0] - labels[pairs[:, 1], 0])
    frac_scaled = float((d / np.sqrt(2.0) <= t).mean())
    frac_2t = float((d <= 2 * t).mean())
    print(f"\nwithin-{t} steer ceiling (Bayes predictor):")
    print(f"  P(|y1-y2|/sqrt2 <= {t}) = {frac_scaled:.4f}   "
          f"[sanity: sqrt P(|y1-y2|<=2t) = {np.sqrt(frac_2t):.4f}]")


if __name__ == "__main__":
    main()
