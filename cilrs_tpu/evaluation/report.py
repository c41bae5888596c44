"""Offline model evaluation: the evaluation_report.json metrics.

Parity with the reference's offline eval on the 26,439-sample val split
(evaluation_report.json:1-78): per-control MAE / MSE / RMSE / Pearson
correlation, per-command sample counts + steer MAE/RMSE, steering error
percentiles, and accuracy-within-threshold buckets.
"""

from __future__ import annotations

import json

import numpy as np

from cilrs_tpu.config import COMMAND_NAMES

CONTROL_NAMES = ("steer", "throttle", "brake", "speed")
ACCURACY_THRESHOLDS = (0.01, 0.05, 0.1)
PERCENTILES = (50, 75, 90, 95, 99)


def _corr(a: np.ndarray, b: np.ndarray) -> float:
    if a.std() < 1e-9 or b.std() < 1e-9:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


def offline_report(
    pred: np.ndarray,  # [N, 4] steer, throttle, brake, pred_speed(norm)
    true: np.ndarray,  # [N, 4] same layout (speed normalized)
    command: np.ndarray,  # [N]
    weather: np.ndarray | None = None,  # [N] weather index (0..4), optional
) -> dict:
    report: dict = {"num_samples": int(len(pred))}
    for k, name in enumerate(CONTROL_NAMES):
        err = pred[:, k] - true[:, k]
        report[name] = {
            "mae": float(np.abs(err).mean()),
            "mse": float((err ** 2).mean()),
            "rmse": float(np.sqrt((err ** 2).mean())),
            "correlation": _corr(pred[:, k], true[:, k]),
        }
    per_cmd = {}
    steer_err = np.abs(pred[:, 0] - true[:, 0])
    for c, cname in enumerate(COMMAND_NAMES):
        mask = command == c
        if mask.sum() == 0:
            continue
        per_cmd[cname] = {
            "samples": int(mask.sum()),
            "steer_mae": float(steer_err[mask].mean()),
            "steer_rmse": float(np.sqrt(((pred[mask, 0] - true[mask, 0]) ** 2).mean())),
        }
    report["per_command"] = per_cmd
    report["steer_percentiles"] = {
        f"p{p}": float(np.percentile(steer_err, p)) for p in PERCENTILES
    }
    report["steer_accuracy"] = {
        f"within_{t}": float((steer_err <= t).mean()) for t in ACCURACY_THRESHOLDS
    }
    if weather is not None:
        # Localizes weather-conditional failure (e.g. the aux speed head
        # reading motion cues through night/fog dimming) that the aggregate
        # correlations average away.
        from cilrs_tpu.config import WEATHER_NAMES

        per_w = {}
        for w, wname in enumerate(WEATHER_NAMES):
            mask = weather == w
            if mask.sum() == 0:
                continue
            per_w[wname] = {"samples": int(mask.sum())}
            for k, name in enumerate(CONTROL_NAMES):
                err = pred[mask, k] - true[mask, k]
                per_w[wname][name] = {
                    "mae": float(np.abs(err).mean()),
                    "correlation": _corr(pred[mask, k], true[mask, k]),
                }
        report["per_weather"] = per_w
    return report


def save_report(report: dict, path: str):
    with open(path, "w") as f:
        json.dump(report, f, indent=2)


def collect_predictions_resident(state, table: dict, labels: dict,
                                 idx: np.ndarray, batch: int, cfg) -> tuple:
    """collect_predictions against a device-resident table
    (data/resident.collect_resident): frames gather through the Pallas
    row-gather kernel inside a scanned eval program; only the [N, 4]
    prediction floats cross the tunnel."""
    import functools

    import jax
    import jax.numpy as jnp

    from cilrs_tpu.ops.gather import gather_rows_paged
    from cilrs_tpu.train.steps import make_eval_step

    img_shape = tuple(table["image_shape"])
    D = int(np.prod(img_shape))
    page_rows = int(table.get("page_rows", 0))
    base_eval = make_eval_step(cfg)
    K = 25

    @functools.partial(jax.jit, static_argnames=())
    def eval_group(state_, dds, idxs):  # idxs [K, B] global rows
        flat = idxs.reshape(-1)
        b = {k: dds[k][flat] for k in ("speed", "command", "controls")}
        pages = dds["images"]
        pages = pages if isinstance(pages, tuple) else (pages,)
        b["images"] = gather_rows_paged(pages, flat, page_rows)[:, :D].reshape(
            (flat.shape[0],) + img_shape)
        b = jax.tree.map(lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

        def body(_, batch_):
            return None, base_eval(state_, batch_)["pred"]

        _, preds = jax.lax.scan(body, None, b)
        return preds.reshape(-1, preds.shape[-1])

    dds = {k: table[k] for k in ("images", "speed", "command", "controls")}
    preds = []
    group = batch * K
    for s in range(0, len(idx), group):
        rows = idx[s : s + group]
        n_rows = len(rows)
        # Pad the tail group to a batch multiple by cycling rows (np.resize
        # repeats, so it works even when the tail is shorter than one batch);
        # the padded predictions are trimmed right back off.
        padded = np.resize(rows, -(-n_rows // batch) * batch)
        out = np.asarray(eval_group(
            state, dds, jnp.asarray(padded.reshape(-1, batch))))
        preds.append(out[:n_rows])
    pred = np.concatenate(preds) if preds else np.zeros((0, 4))
    used = idx
    true = np.concatenate(
        [labels["controls"][used], labels["speed"][used][:, None]], axis=1)
    return pred, true, labels["command"][used]


def collect_predictions(state, ds, idx: np.ndarray, batch: int, eval_step) -> tuple:
    """Run eval_step over idx in batches; returns (pred [N,4], true [N,4], cmd)."""
    import jax.numpy as jnp

    preds = []
    n = (len(idx) // batch) * batch
    for s in range(0, n, batch):
        b = idx[s : s + batch]
        parts = eval_step(state, {
            "images": jnp.asarray(ds.images[b]),
            "speed": jnp.asarray(ds.speed_norm[b]),
            "command": jnp.asarray(ds.command[b]),
            "controls": jnp.asarray(ds.controls[b]),
        })
        preds.append(np.asarray(parts["pred"]))
    pred = np.concatenate(preds) if preds else np.zeros((0, 4))
    used = idx[:n]
    true = np.concatenate([ds.controls[used], ds.speed_norm[used][:, None]], axis=1)
    return pred, true, ds.command[used]
