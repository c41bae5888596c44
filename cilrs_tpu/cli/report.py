"""Offline model evaluation CLI -> evaluation_report.json parity.

    python -m cilrs_tpu.cli.report --data data/session_001 --checkpoint runs/cilrs \
        --out evaluation_report.json
"""

from __future__ import annotations

import argparse
import json

import jax

from cilrs_tpu.config import load_train_config
from cilrs_tpu.data.dataset import load_sessions, stratified_split
from cilrs_tpu.evaluation.report import collect_predictions, offline_report, save_report
from cilrs_tpu.train.checkpoint import restore_best_params
from cilrs_tpu.train.state import create_train_state
from cilrs_tpu.train.steps import make_eval_step


def main(argv=None):
    from cilrs_tpu.cli.common import enable_compilation_cache, require_accelerator
    enable_compilation_cache()
    require_accelerator()
    p = argparse.ArgumentParser(description="CILRS-TPU offline evaluation report")
    p.add_argument("--data", nargs="+", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="evaluation_report.json")
    p.add_argument("--batch-size", type=int, default=120)
    args = p.parse_args(argv)

    cfg = load_train_config()
    ds = load_sessions(args.data)
    _, val_idx = stratified_split(ds, cfg.training.val_fraction, cfg.training.seed)
    print(f"  evaluating on {len(val_idx)} val samples")

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_best_params(args.checkpoint, state)
    eval_step = jax.jit(make_eval_step(cfg))
    pred, true, cmd = collect_predictions(state, ds, val_idx, args.batch_size, eval_step)
    report = offline_report(pred, true, cmd)
    save_report(report, args.out)
    print(json.dumps({k: report[k] for k in ("num_samples", "steer")}, indent=2))
    print(f"full report -> {args.out}")
    return report


if __name__ == "__main__":
    main()
