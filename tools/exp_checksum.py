"""Bitwise cross-collection checksum audit of the resident table.

Determinism gives an oracle: a 150k collection is a bit-identical prefix of a
200k collection (same seed/envs — label CSVs match row-for-row, verified).
So per-row image checksums must match too. This tool:

  phase 1: collect 150k (8.40 GB — below the 2^33-byte line), checksum every
           row via the Pallas gather (trusted at this size: r4b/r4g healthy);
  phase 2: free it, collect 200k (11.2 GB — past 2^33 at row 161,319.88),
           checksum rows via BOTH the Pallas row-gather and a plain XLA
           dynamic_slice;
  compare: (a) 200k vs 150k checksums on rows [0, 150k): any mismatch is
           WRITE-side corruption that only manifests in big tables;
           (b) Pallas vs dynamic_slice on the 200k table over all rows,
           especially across the 161,320 row boundary: divergence is
           READ-side corruption in the gather kernel.

If both pass, the table is bit-faithful at 200k and the 200k training
collapse is NOT a data-corruption bug.

CAVEAT (paged tables): the prefix oracle only holds within one page. A PAGED
collection (data/resident.py) drops up to M-1 overshoot frames at each page
rollover, so past the first page boundary a paged collection is the
monolithic one with small row-gaps at multiples of page_rows — compare
monolithic-vs-monolithic (CILRS_TPU_ALLOW_BIG_TABLE=1) or restrict the
bitwise comparison to rows < page_rows.
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
    p.add_argument("--small", type=int, default=150_000)
    p.add_argument("--big", type=int, default=200_000)
    p.add_argument("--envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--out", default="runs/checksum_audit.json")
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

    def checksums_gather(imgs, n):
        """Per-row u64 sums + a position-sensitive hash via the Pallas path."""
        D = imgs.shape[1] * imgs.shape[2]
        w = (jnp.arange(D, dtype=jnp.uint32) % 251 + 1).astype(jnp.uint32)

        @jax.jit
        def f(imgs, idx):
            rows = gather_rows(imgs, idx).astype(jnp.uint32)  # [B, D]
            return rows.sum(axis=1), (rows * w).sum(axis=1)

        s = np.zeros(n, np.uint32)
        h = np.zeros(n, np.uint32)
        for lo in range(0, n, args.batch):
            idx = jnp.arange(lo, min(lo + args.batch, n), dtype=jnp.int32)
            a, b = jax.device_get(f(imgs, idx))
            s[lo:lo + len(idx)] = a
            h[lo:lo + len(idx)] = b
        return s, h

    def checksums_dynslice(imgs, n):
        """Same sums via plain XLA dynamic_slice (no Pallas)."""
        D = imgs.shape[1] * imgs.shape[2]
        w = (jnp.arange(D, dtype=jnp.uint32) % 251 + 1).astype(jnp.uint32)
        B = args.batch

        @jax.jit
        def f(imgs, lo):
            rows = jax.lax.dynamic_slice(
                imgs, (lo, 0, 0), (B, imgs.shape[1], imgs.shape[2]))
            rows = rows.reshape(B, D).astype(jnp.uint32)
            return rows.sum(axis=1), (rows * w).sum(axis=1)

        s = np.zeros(n + B, np.uint32)
        h = np.zeros(n + B, np.uint32)
        for lo in range(0, n, B):
            start = min(lo, imgs.shape[0] - B)
            a, b = jax.device_get(f(imgs, jnp.asarray(start, jnp.int32)))
            s[start:start + B] = a
            h[start:start + B] = b
        return s[:n], h[:n]

    print(f"=== phase 1: collect {args.small} (safe size) ===", flush=True)
    table, _, _ = collect_resident(net, args.small, num_envs=args.envs,
                                   num_vehicles=12, num_pedestrians=6,
                                   weather_idx=None, seed=args.seed)
    table = unwrap_monolithic(table)
    s_small, h_small = checksums_gather(table["images"], args.small)
    del table
    import gc
    gc.collect()

    print(f"=== phase 2: collect {args.big} (past 2^33 bytes) ===", flush=True)
    table, _, _ = collect_resident(net, args.big, num_envs=args.envs,
                                   num_vehicles=12, num_pedestrians=6,
                                   weather_idx=None, seed=args.seed)
    table = unwrap_monolithic(table)
    s_big_g, h_big_g = checksums_gather(table["images"], args.big)
    s_big_d, h_big_d = checksums_dynslice(table["images"], args.big)

    row_bytes = int(np.prod(table["images"].shape[1:]))
    wrap_row = (2 ** 33) / row_bytes

    # (a) write integrity: prefix rows must match across collections
    wmis = np.where((s_big_g[:args.small] != s_small)
                    | (h_big_g[:args.small] != h_small))[0]
    print(f"WRITE audit: {len(wmis)} / {args.small} prefix rows differ "
          f"between the {args.small} and {args.big} collections")
    if len(wmis):
        print(f"  first/last mismatched rows: {wmis[:5].tolist()} ... "
              f"{wmis[-5:].tolist()}")
        frac_bins = [round(float(((wmis >= lo) & (wmis < lo + 10_000)).sum())
                           / 10_000, 4) for lo in range(0, args.small, 10_000)]
        print(f"  mismatch frac per 10k rows: {frac_bins}")

    # (b) read integrity: Pallas gather vs dynamic_slice on the big table
    rmis = np.where((s_big_g != s_big_d) | (h_big_g != h_big_d))[0]
    print(f"READ audit: {len(rmis)} / {args.big} rows differ between "
          f"gather_rows and dynamic_slice (2^33 boundary at row {wrap_row:.1f})")
    if len(rmis):
        print(f"  first/last mismatched rows: {rmis[:5].tolist()} ... "
              f"{rmis[-5:].tolist()}")
        below = int((rmis < int(wrap_row)).sum())
        print(f"  {below} below the boundary, {len(rmis) - below} at/above")

    with open(args.out, "w") as f:
        json.dump({
            "small": args.small, "big": args.big, "row_bytes": row_bytes,
            "wrap_row": wrap_row,
            "write_mismatches": int(len(wmis)),
            "write_first": wmis[:20].tolist() if len(wmis) else [],
            "read_mismatches": int(len(rmis)),
            "read_first": rmis[:20].tolist() if len(rmis) else [],
        }, f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
