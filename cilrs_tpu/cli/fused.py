"""Fused on-device collect+train CLI (frames never leave the TPU).

    python -m cilrs_tpu.cli.fused --steps 3000 --envs 32 --ckpt-dir runs/fused
"""

from __future__ import annotations

import argparse
import json

from cilrs_tpu.cli.common import build_map
from cilrs_tpu.config import load_train_config


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU fused collect+train")
    p.add_argument("--map", default="town01")
    p.add_argument("--steps", type=int, default=2000, help="total train steps")
    p.add_argument("--envs", type=int, default=32)
    p.add_argument("--vehicles", type=int, default=12)
    p.add_argument("--walkers", type=int, default=6)
    p.add_argument("--buffer", type=int, default=65536)
    p.add_argument("--collect-ticks", type=int, default=20)
    p.add_argument("--train-per-chunk", type=int, default=4)
    p.add_argument("--settle-fraction", type=float, default=0.25,
                   help="tail fraction of train steps run with collection "
                        "frozen (multi-epoch pass over the final ring)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--history-json", default=None)
    p.add_argument("--single-device", action="store_true",
                   help="disable the sharded multi-device path")
    args = p.parse_args(argv)

    # Multi-process init MUST precede any backend use (jax.devices() raises
    # from jax.distributed.initialize() once the backend exists).
    from cilrs_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    import jax

    from cilrs_tpu.train.fused import fused_collect_train

    mesh = None
    if not args.single_device and len(jax.devices()) > 1:
        from cilrs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"  mesh: {mesh.devices.size} devices (fleet + ring buffer "
              f"sharded, DP gradients)")

    net = build_map(args.map)
    cfg = load_train_config()
    out = fused_collect_train(
        net, cfg, num_envs=args.envs, num_vehicles=args.vehicles,
        num_pedestrians=args.walkers, buffer_frames=args.buffer,
        collect_ticks=args.collect_ticks,
        train_steps_per_chunk=args.train_per_chunk,
        total_train_steps=args.steps, seed=args.seed,
        settle_fraction=args.settle_fraction,
        mesh=mesh,
    )
    print(f"\nfused run: {out['frames_collected']:,} frames collected, "
          f"{out['train_steps']} train steps in {out['wall_s']:.0f}s "
          f"({out['frames_per_sec_train']:,.0f} train frames/s)")
    if out["history"]:
        print(f"final holdout loss: {out['history'][-1]['val_loss']:.4f}")
    if args.ckpt_dir:
        from cilrs_tpu.train.checkpoint import save_checkpoint

        vl = out["history"][-1]["val_loss"] if out["history"] else float("nan")
        save_checkpoint(args.ckpt_dir, out["state"], epoch=1, val_loss=vl, is_best=True)
        print(f"checkpoint -> {args.ckpt_dir}")
    if args.history_json:
        with open(args.history_json, "w") as f:
            json.dump({k: v for k, v in out.items() if k != "state"}, f, indent=2, default=float)
    return out


if __name__ == "__main__":
    main()
