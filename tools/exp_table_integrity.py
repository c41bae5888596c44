"""Per-row integrity oracle for the resident collection table.

Weather is assigned per env (env = row % ... no — labels carry env; weather =
env % 5 for mixed collects), and the night shader (weather 3) darkens frames
by ~4x. So per-row mean brightness vs the row's ENV LABEL is an alignment
oracle that needs no second collection: if a row labeled night is bright (or a
labeled-day row is dark), the image bytes in that row do NOT belong to that
row's labels.

Motivation: the prefix arm of tools/exp_tail_poison.py collapsed — training
on rows < 150k of a 200k collection fails where the identical recipe on a
150k collection (r4b) is healthy. Since the sim is deterministic in (seed,
envs) and labels are bit-identical, the remaining suspect is the TABLE BYTES:
the healthy 150k table is 8.40 GB, JUST UNDER 2^33 bytes = 8.59 GB; the 200k
table is 11.2 GB, past it. A 32-bit (4-byte-word) offset wrap in the write
path would make writes at cursor >= 161,320 rows land back at the table head,
overwriting early rows with late frames -> image-label misalignment across
the head region. This tool maps WHERE alignment breaks, row by row.

Usage:
    python tools/exp_table_integrity.py --frames 200000   # suspect table
    python tools/exp_table_integrity.py --frames 150000   # control
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Diagnostic tools deliberately build >2^33-byte tables (quarantined for
# production runs by data/resident.py).
os.environ.setdefault("CILRS_TPU_ALLOW_BIG_TABLE", "1")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200_000)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args(argv)

    from cilrs_tpu.cli.common import (build_map, enable_compilation_cache,
                                      require_accelerator)
    enable_compilation_cache()
    require_accelerator()

    import jax
    import jax.numpy as jnp

    from cilrs_tpu.data.resident import collect_resident, unwrap_monolithic
    from cilrs_tpu.ops.gather import gather_rows

    net = build_map("town01")
    table, labels, _ = collect_resident(
        net, args.frames, num_envs=args.envs, num_vehicles=12,
        num_pedestrians=6, weather_idx=None, seed=args.seed)
    table = unwrap_monolithic(table)

    H, W, C = table["image_shape"]
    D = H * W * C
    N = args.frames

    @jax.jit
    def row_means(imgs, idx):
        rows = gather_rows(imgs, idx)[:, :D].astype(jnp.float32)
        return rows.mean(axis=1)

    means = np.zeros(N, np.float32)
    for s in range(0, N, args.batch):
        idx = jnp.arange(s, min(s + args.batch, N), dtype=jnp.int32)
        means[s:s + len(idx)] = np.asarray(jax.device_get(
            row_means(table["images"], idx)))

    env = labels["env"]
    night = (env % 5) == 3
    assert night.any() and (~night).any(), (
        "the weather-alignment oracle needs a MIXED-weather collection "
        "(night and non-night rows); this table has only one population — "
        "collect with weather_idx=None")
    # Thresholds from the shader: night frames average far darker than any
    # day weather. Use the global separation point between the two label
    # populations' medians as the split.
    med_n = float(np.median(means[night]))
    med_d = float(np.median(means[~night]))
    thr = 0.5 * (med_n + med_d)
    looks_night = means < thr
    mismatch = looks_night != night
    print(f"night-label median {med_n:.1f}, day-label median {med_d:.1f}, "
          f"threshold {thr:.1f}")
    print(f"TOTAL label<->image weather mismatches: {int(mismatch.sum())} "
          f"/ {N} ({100.0 * mismatch.mean():.2f}%)")

    # Where do mismatches live? 10k-row bins.
    bins = []
    for lo in range(0, N, 10_000):
        m = mismatch[lo:lo + 10_000]
        bins.append({"row_lo": lo, "mismatch_frac": round(float(m.mean()), 4)})
        print(f"  rows {lo:>7}-{lo + len(m):>7}: mismatch {m.mean():7.2%}")

    # The 2^33-byte boundary in row units, for the report.
    row_bytes = int(np.prod(table["images"].shape[1:]))
    wrap_row = (2 ** 33) / row_bytes
    print(f"row bytes {row_bytes}, 2^33-byte boundary at row {wrap_row:.1f}")

    out = args.out or f"runs/table_integrity_{args.frames}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"frames": N, "row_bytes": row_bytes,
                   "wrap_row": wrap_row, "threshold": thr,
                   "total_mismatch": int(mismatch.sum()),
                   "bins": bins}, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
