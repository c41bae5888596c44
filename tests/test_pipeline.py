"""End-to-end pipeline: collect -> load -> train -> report, on tiny settings.

The full loop the reference spreads across collect_data.py, prepare_dataset.py,
the training notebook, and its offline eval — run here as one deterministic
integration test (SURVEY.md §4's recommended inversion of the reference's
manual QA).
"""

import dataclasses
import json
import os

import numpy as np
import jax
import pytest

from cilrs_tpu.config import ModelConfig, TrainConfig, TrainingConfig
from cilrs_tpu.data.collect import collect_session
from cilrs_tpu.data.dataset import load_sessions, stratified_split
from cilrs_tpu.evaluation.report import collect_predictions, offline_report
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.train.loop import train
from cilrs_tpu.train.state import create_train_state
from cilrs_tpu.train.steps import make_eval_step

TINY_CAM = CameraSpec(width=64, height=32)
TINY_CFG = TrainConfig(
    model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                      stage_sizes=(1, 1, 1, 1)),
    training=TrainingConfig(batch_size=16, epochs=1),
)


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory, mini_town):
    out = str(tmp_path_factory.mktemp("session"))
    stats = collect_session(
        mini_town, out, num_frames=120, num_envs=2, num_vehicles=4,
        num_pedestrians=2, weather_idx=0, seed=3, chunk_steps=50,
        cam=TINY_CAM, verbose=False,
    )
    assert stats["frames"] >= 120
    return out


def test_collect_outputs(session_dir):
    files = os.listdir(session_dir)
    assert "measurements.csv" in files
    assert "summary.txt" in files
    assert any(f.startswith("frames_") for f in files)
    header = open(os.path.join(session_dir, "measurements.csv")).readline().strip()
    # Exact reference schema (collect_data.py:549-564).
    assert header == ("frame,image_filename,steer,throttle,brake,speed_kmh,"
                      "speed_normalized,high_level_command,command_name,"
                      "position_x,position_y,position_z,yaw,timestamp")
    summary = open(os.path.join(session_dir, "summary.txt")).read()
    assert "Command distribution" in summary


def test_load_and_train_and_report(session_dir, tmp_path):
    ds = load_sessions([session_dir])
    assert len(ds) >= 100
    assert ds.images.dtype == np.uint8
    assert ds.images.shape[1:] == (32, 64, 3)
    assert set(np.unique(ds.command)).issubset({0, 1, 2, 3})
    # Labels are in plausible control ranges.
    assert np.abs(ds.controls[:, 0]).max() <= 1.0
    assert ds.controls[:, 1].min() >= 0.0

    out = train(ds, TINY_CFG, ckpt_dir=str(tmp_path / "ck"), steps_per_epoch=4,
                verbose=False)
    assert np.isfinite(out["best_val_loss"])

    # Offline report on the val split.
    _, val_idx = stratified_split(ds, 0.15, 42)
    state = out["state"]
    eval_step = jax.jit(make_eval_step(TINY_CFG))
    pred, true, cmd = collect_predictions(state, ds, val_idx, 8, eval_step)
    if len(pred) > 0:
        report = offline_report(pred, true, cmd)
        assert "steer" in report and "correlation" in report["steer"]
        assert 0.0 <= report["steer_accuracy"]["within_0.1"] <= 1.0
        json.dumps(report)  # serializable
