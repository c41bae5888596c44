"""Resident collect->train path: frames never leave the device.

data/resident.py scatter-compacts rendered frames straight into the flat
[N, R, 128] table layout ops/gather.py reads; train/loop.py's `resident` mode
and evaluation/report.py's resident prediction pass batch-gather from that one
shared table. These tests run the whole loop on tiny shapes and check the
compaction against the disk collector's keep semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cilrs_tpu.config import ModelConfig, TrainConfig, TrainingConfig
from cilrs_tpu.data.resident import collect_resident, labels_dataset
from cilrs_tpu.data.dataset import stratified_split
from cilrs_tpu.evaluation.report import collect_predictions_resident, offline_report
from cilrs_tpu.ops.gather import LANE, padded_row_elems
from cilrs_tpu.parallel.mesh import make_mesh
from cilrs_tpu.render.camera import CameraSpec
from cilrs_tpu.train.loop import train

TINY_CAM = CameraSpec(width=64, height=32)
TINY_CFG = TrainConfig(
    model=ModelConfig(dropout=0.0, image_height=32, image_width=64,
                      stage_sizes=(1, 1, 1, 1)),
    training=TrainingConfig(batch_size=16, epochs=1),
)


@pytest.fixture(scope="module")
def resident_out(mini_town, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resident_session"))
    table, labels, stats = collect_resident(
        mini_town, num_frames=160, num_envs=2, num_vehicles=4,
        num_pedestrians=2, weather_idx=0, seed=3, chunk_steps=50,
        cam=TINY_CAM, output_dir=out, verbose=False,
    )
    return table, labels, stats, out


def test_table_layout_and_compaction(resident_out):
    table, labels, stats, _ = resident_out
    D = 32 * 64 * 3
    R = padded_row_elems(D, np.uint8) // LANE
    # Single-page collection: images is a 1-tuple of pages.
    assert isinstance(table["images"], tuple) and len(table["images"]) == 1
    assert table["page_rows"] == 160
    img0 = table["images"][0]
    # 160 dataset rows + one chunk (2 envs x 50 ticks) of DUS slack.
    assert img0.shape == (160 + 100, R, LANE)
    assert img0.dtype == jnp.uint8
    assert table["image_shape"] == (32, 64, 3)
    # Compaction: every dataset row [0, N) is a kept (moving, nominal)
    # frame — no invalid slots, unlike the fused ring's masked writes.
    assert stats["frames"] == 160
    assert len(labels["speed_kmh"]) == 160
    assert np.all(labels["speed_kmh"] > 0.5)
    assert 0.0 < stats["keep_fraction"] <= 1.0
    # Labels in range; commands one of the 4 reference classes.
    assert set(np.unique(labels["command"])).issubset({0, 1, 2, 3})
    assert np.abs(labels["controls"][:, 0]).max() <= 1.0
    assert np.all(labels["speed"] >= 0.0) and np.all(labels["speed"] <= 1.0)
    # Device labels mirror host labels over the dataset rows.
    np.testing.assert_allclose(np.asarray(table["speed"])[:160], labels["speed"])
    # Rows hold real pixels (a rendered frame is never all-zero).
    assert np.asarray(jnp.sum(img0[0])) > 0
    assert np.asarray(jnp.sum(img0[159])) > 0


def test_session_csv_parity(resident_out):
    import os

    _, _, _, out = resident_out
    header = open(os.path.join(out, "measurements.csv")).readline().strip()
    assert header == ("frame,image_filename,steer,throttle,brake,speed_kmh,"
                      "speed_normalized,high_level_command,command_name,"
                      "position_x,position_y,position_z,yaw,timestamp")
    rows = open(os.path.join(out, "measurements.csv")).readlines()
    assert len(rows) == 161  # header + 160 frames
    assert "resident#0" in rows[1]
    assert os.path.exists(os.path.join(out, "aux.csv"))
    assert "Command distribution" in open(os.path.join(out, "summary.txt")).read()


def test_train_and_report_from_table(resident_out, tmp_path):
    table, labels, _, _ = resident_out
    ds = labels_dataset(labels)
    out = train(ds, TINY_CFG, ckpt_dir=str(tmp_path / "ck"), steps_per_epoch=4,
                verbose=False, mesh=make_mesh(1), resident=table)
    assert np.isfinite(out["best_val_loss"])

    _, val_idx = stratified_split(ds, 0.15, 42)
    pred, true, cmd = collect_predictions_resident(
        out["state"], table, labels, val_idx, 8, TINY_CFG)
    assert pred.shape == true.shape and pred.shape[1] == 4
    assert np.all(np.isfinite(pred))
    report = offline_report(pred, true, cmd)
    assert "steer" in report and np.isfinite(report["steer"]["mae"])


def test_refresh_swaps_train_table(resident_out):
    """train(refresh_fn=..., refresh_every=1): the train table is swapped
    after every epoch except the last, training continues across swaps, and
    the returned val snapshot is independent of the (long-gone) first table."""
    table, labels, _, _ = resident_out
    ds = labels_dataset(labels)
    n = len(labels["speed"])
    calls = []

    def refresh(i):
        calls.append(i)
        perm = np.arange(n)[::-1].copy()  # same frames, new row order
        t2 = {
            "page_rows": n,
            "images": jnp.asarray(np.asarray(table["images"][0])[:n][perm]),
            "speed": jnp.asarray(labels["speed"][perm]),
            "command": jnp.asarray(labels["command"][perm]),
            "controls": jnp.asarray(labels["controls"][perm]),
        }
        lab2 = {k: labels[k][perm] for k in ("speed", "command", "controls")}
        return t2, labels_dataset(lab2)

    cfg = TrainConfig(
        model=TINY_CFG.model,
        training=TrainingConfig(batch_size=16, epochs=3),
    )
    out = train(ds, cfg, steps_per_epoch=2, verbose=False, mesh=make_mesh(1),
                resident=table, refresh_fn=refresh, refresh_every=1)
    assert calls == [1, 2]  # after epochs 1 and 2; never after the last
    assert np.isfinite(out["best_val_loss"])
    _, val_idx = stratified_split(ds, cfg.training.val_fraction,
                                  cfg.training.seed)
    vt = out["val_table"]
    assert vt is not None and vt["images"].shape[0] == len(val_idx)
    assert vt["image_shape"] == (32, 64, 3)
    # Snapshot rows are the val rows of the ORIGINAL table, bit-exact.
    direct = np.asarray(table["images"][0])[val_idx]
    np.testing.assert_array_equal(np.asarray(vt["images"]), direct)
    np.testing.assert_allclose(np.asarray(vt["speed"]),
                               labels["speed"][val_idx])


@pytest.fixture(scope="module")
def paged_out(mini_town):
    """A forced-3-page collection (tiny max_page_bytes): the production
    layout for >2^33-byte datasets, on CPU-sized shapes."""
    D_pad = padded_row_elems(32 * 64 * 3, np.uint8)
    # 4 envs x 25 ticks -> M=100 slack/page; max 160 slots/page -> 60 logical
    # -> 3 balanced pages of 54 rows for N=160.
    table, labels, stats = collect_resident(
        mini_town, num_frames=160, num_envs=4, num_vehicles=4,
        num_pedestrians=2, weather_idx=None, seed=5, chunk_steps=25,
        cam=TINY_CAM, verbose=False, max_page_bytes=161 * D_pad,
    )
    return table, labels, stats


def test_paged_collection_layout(paged_out):
    table, labels, stats = paged_out
    assert stats["num_pages"] == 3 and stats["page_rows"] == 54
    assert isinstance(table["images"], tuple) and len(table["images"]) == 3
    assert table["page_rows"] == 54
    # Each page physically holds page_rows + slack; logical rows: 54/54/52.
    for pg in table["images"]:
        assert pg.shape[0] == 54 + 100
    assert len(labels["speed"]) == 160
    # Device label concat mirrors host labels across page boundaries.
    np.testing.assert_allclose(np.asarray(table["speed"]), labels["speed"])
    np.testing.assert_array_equal(np.asarray(table["command"]),
                                  labels["command"])


def test_paged_gather_and_alignment(paged_out):
    """gather_rows_paged routes global rows to the right page (vs direct
    per-page reads), and image<->label alignment survives page rollover:
    rows labeled night (env % 5 == 3) must render far darker than clear."""
    from cilrs_tpu.ops.gather import gather_rows_paged

    table, labels, _ = paged_out
    page_rows = table["page_rows"]
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 160, size=24)
    rows = np.asarray(gather_rows_paged(
        table["images"], jnp.asarray(idx), page_rows))
    for k, g in enumerate(idx):
        direct = np.asarray(table["images"][g // page_rows][g % page_rows])
        np.testing.assert_array_equal(rows[k], direct.reshape(-1),
                                      err_msg=f"global row {g}")
    # Weather-brightness oracle across ALL rows (catches misrouted pages).
    D = 32 * 64 * 3
    all_rows = np.concatenate([
        np.asarray(gather_rows_paged(table["images"],
                                     jnp.arange(s, min(s + 64, 160)),
                                     page_rows))
        for s in range(0, 160, 64)])
    means = all_rows[:, :D].astype(np.float32).mean(axis=1)
    night = (labels["env"] % 5) == 3
    if night.any() and (~night).any():
        assert means[night].mean() < 0.55 * means[~night].mean()


def test_paged_train_and_report(paged_out, tmp_path):
    """End-to-end on a multi-page table: train gathers + epoch evals route
    across pages, and the offline report runs against the paged val table."""
    table, labels, _ = paged_out
    ds = labels_dataset(labels)
    out = train(ds, TINY_CFG, ckpt_dir=str(tmp_path / "ck"), steps_per_epoch=4,
                verbose=False, mesh=make_mesh(1), resident=table)
    assert np.isfinite(out["best_val_loss"])
    _, val_idx = stratified_split(ds, 0.15, 42)
    # Val rows span the page boundary (global split over 160 rows, 3 pages).
    assert (val_idx >= table["page_rows"]).any() and (val_idx < table["page_rows"]).any()
    pred, true, cmd = collect_predictions_resident(
        out["state"], table, labels, val_idx, 8, TINY_CFG)
    assert pred.shape == true.shape and np.all(np.isfinite(pred))
    report = offline_report(pred, true, cmd)
    assert np.isfinite(report["steer"]["mae"])


def test_resident_gather_matches_table(resident_out):
    """A gathered train batch must equal direct row reads of the table."""
    from cilrs_tpu.ops.gather import gather_rows

    table, labels, _, _ = resident_out
    idx = jnp.asarray([0, 7, 159, 33])
    rows = np.asarray(gather_rows(table["images"][0], idx))
    direct = np.asarray(table["images"][0])[np.asarray(idx)].reshape(4, -1)
    np.testing.assert_array_equal(rows, direct)
    D = 32 * 64 * 3
    imgs = rows[:, :D].reshape(4, 32, 64, 3)
    assert imgs.sum() > 0


def test_paged_collection_fresh_sessions(paged_out):
    """Multi-page collections restart the world per page (fresh-session
    protocol, reference 5-session parity): tick provenance resets at each
    page boundary instead of continuing the sim clock."""
    table, labels, _ = paged_out
    page_rows = table["page_rows"]
    ticks = labels["tick"]
    for p in (1, 2):
        first = ticks[p * page_rows : p * page_rows + 4]
        # A continuous run would carry ticks ~p * (page_rows / envs) here.
        assert first.min() < 50, f"page {p} does not restart: ticks {first}"


def test_stream_seed_changes_training_stream(resident_out):
    """stream_seed reseeds init/sampler (the bistability arms + latch probes)
    while the split/val stay fixed — same val size, different trajectories."""
    table, labels, _, _ = resident_out
    ds = labels_dataset(labels)
    t = dict(table)
    a = train(ds, TINY_CFG, steps_per_epoch=3, verbose=False,
              mesh=make_mesh(1), resident=dict(t))
    b = train(ds, TINY_CFG, steps_per_epoch=3, verbose=False,
              mesh=make_mesh(1), resident=dict(t), stream_seed=7)
    assert a["history"][0]["train_loss"] != b["history"][0]["train_loss"]
