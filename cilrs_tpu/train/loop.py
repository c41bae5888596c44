"""The training loop: epochs, validation, early stopping, history, checkpoints.

Host-side orchestration of the jitted steps — the counterpart of notebook
PARTs D/E: per-epoch train + validate with per-command steer errors, StepLR
(inside the optimizer schedule), best/latest checkpoints, early stop after 6
epochs without improvement, and training_history.csv. Batches shard over the
mesh's data axis; the model replicates.
"""

from __future__ import annotations

import csv
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from cilrs_tpu.config import COMMAND_NAMES, TrainConfig
from cilrs_tpu.data.dataset import DriveDataset, WeightedBatchSampler, stratified_split
from cilrs_tpu.parallel.mesh import batch_spec, make_mesh, replicate
from cilrs_tpu.train import checkpoint as ckpt
from cilrs_tpu.train.state import CILRSTrainState, create_train_state
from cilrs_tpu.train.steps import make_eval_step, make_train_step


def _device_batch(ds: DriveDataset, idx: np.ndarray, sharding=None):
    batch = {
        "images": ds.images[idx],
        "speed": ds.speed_norm[idx],
        "command": ds.command[idx],
        "controls": ds.controls[idx],
    }
    if sharding is not None:
        batch = jax.device_put(batch, sharding)
    return batch


def _prefetch(it, make, depth: int = 3):
    """Run `make(item)` for each item of `it` on a worker thread, keeping up to
    `depth` results queued. jax.device_put is async, so the host gather + H2D
    overlap with the device's current train step — without this the loop is
    host-bound (one synchronous 6 MB gather+transfer per step)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    STOP = object()

    def worker():
        try:
            for item in it:
                q.put(make(item))
        finally:
            q.put(STOP)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        out = q.get()
        if out is STOP:
            break
        yield out


def train(
    ds: DriveDataset,
    cfg: TrainConfig | None = None,
    ckpt_dir: str | None = None,
    resume: bool = False,
    mesh=None,
    steps_per_epoch: int | None = None,
    verbose: bool = True,
    pretrained_backbone: str | None = None,
    resident: dict | None = None,
    ckpt_every: int = 5,
    refresh_fn=None,
    refresh_every: int = 0,
    init_from: str | None = None,
    max_train_frames: int | None = None,
    train_row_mask: np.ndarray | None = None,
    eval_every: int = 1,
    stream_seed: int | None = None,
) -> dict:
    """Full training run. Returns history dict incl. best_val_loss.

    With `resident` (a table from data/resident.collect_resident: images
    already on device in gather_rows' [N, R, 128] layout + device labels),
    nothing ships — train batches gather from the resident table by global
    index, and the val rows are snapshotted once into an independent compact
    table. `ds` then carries only host labels (images=None) for the
    stratified split and the weighted sampler.

    With `refresh_fn` (resident mode only), every `refresh_every` epochs the
    train table is SWAPPED for freshly collected frames: refresh_fn(i) must
    return (table, labels_ds) — a new collect_resident table plus its
    labels_dataset. The simulator is first-party device code here, so data is
    effectively free; refreshing turns a fixed 150K-frame dataset into an
    unbounded one (every epoch group sees unseen frames — the BC overfit the
    reference combats with augmentation largely disappears). The val snapshot
    never changes, so val_loss stays comparable across refreshes.
    """
    cfg = cfg or TrainConfig()
    mesh = mesh or make_mesh()
    bspec = batch_spec(mesh)

    if refresh_fn is not None and (max_train_frames is not None
                                   or train_row_mask is not None):
        # The bisect controls restrict the INITIAL split only; after a refresh
        # swaps the table, train_idx resets to the new collection and any
        # restriction would be silently dropped (round-3 advisor finding).
        raise ValueError(
            "max_train_frames / train_row_mask cannot be combined with "
            "refresh_fn: the restriction would be silently dropped at the "
            "first table refresh")

    train_idx, val_idx = stratified_split(ds, cfg.training.val_fraction, cfg.training.seed)
    if max_train_frames is not None and len(train_idx) > max_train_frames:
        # Random train-split subsample at a FIXED val split: the control arm
        # for dataset-scaling bisects (train on k of N collected frames while
        # val rows stay identical to the full-N run, so reports compare 1:1).
        sub = np.random.RandomState(cfg.training.seed + 7).choice(
            len(train_idx), max_train_frames, replace=False)
        train_idx = train_idx[np.sort(sub)]
        if verbose:
            print(f"  train split subsampled to {len(train_idx)} frames "
                  f"(max_train_frames)", flush=True)
    if train_row_mask is not None:
        # Region-restricted training at a FIXED val split (dataset-region
        # bisects: e.g. train only on rows collected before tick T while val
        # rows stay identical to the unrestricted run).
        before = len(train_idx)
        train_idx = train_idx[train_row_mask[train_idx]]
        if verbose:
            print(f"  train split restricted {before} -> {len(train_idx)} rows "
                  f"(train_row_mask)", flush=True)
    B = cfg.training.batch_size
    # Round batch to the mesh size for even sharding.
    n_dev = len(mesh.devices.flatten())
    B = max(n_dev, (B // n_dev) * n_dev)
    spe = steps_per_epoch or max(1, len(train_idx) // B)

    # stream_seed: init/sampler/aug seed override that leaves the SPLIT at
    # cfg.training.seed, so val stays identical across seed arms (the
    # round-6 bistability experiments — and any multi-seed training).
    sseed = cfg.training.seed if stream_seed is None else stream_seed
    state = create_train_state(cfg, jax.random.PRNGKey(sseed), spe)
    if init_from:
        # Warm start from another run's BEST slot (params + BN stats; fresh
        # optimizer/schedule) — stage-2 fine-tunes on a fixed table after a
        # refresh run, giving session-split val numbers on reference protocol.
        state = ckpt.restore_best_params(init_from, state)
        if verbose:
            print(f"  params initialized from {init_from} (best slot)")
    if pretrained_backbone:
        from cilrs_tpu.models.torch_import import init_trunk_from_torchvision

        p_new, s_new = init_trunk_from_torchvision(
            state.params, state.batch_stats, pretrained_backbone)
        state = state.replace(params=p_new, batch_stats=s_new)
        if verbose:
            print(f"  trunk initialized from {pretrained_backbone} "
                  f"(ImageNet-pretrained resnet34, notebook PART B parity)")
    state = jax.tree.map(
        lambda x: replicate(mesh, x) if isinstance(x, jax.Array) else x, state
    )
    start_epoch, best_val = 0, float("inf")
    if resume and ckpt_dir:
        state, start_epoch, best_val = ckpt.restore_latest(ckpt_dir, state)
        if verbose and start_epoch:
            print(f"  resumed from epoch {start_epoch} (val {best_val:.4f})")

    base_train_step = make_train_step(cfg)
    base_eval_step = make_eval_step(cfg)

    # Polyak-averaged eval/deploy params (train/fused.py measured the EMA
    # iterate steadier AND better on holdout than the raw iterate). Params and
    # batch stats average together — averaged params with the latest BN
    # running stats is inconsistent. jnp.copy: state is donated into the
    # resident train dispatch, which would invalidate an aliased tree.
    use_ema = cfg.training.ema_eval
    if use_ema:
        ema = jax.tree.map(jnp.copy, {"params": state.params,
                                      "batch_stats": state.batch_stats})
        ema_updates = 0

        @jax.jit
        def _ema_update(e, s, d):
            cur = {"params": s.params, "batch_stats": s.batch_stats}
            return jax.tree.map(lambda a, b: d * a + (1.0 - d) * b, e, cur)

    def _ema_after(st, steps_in_dispatch):
        # Ramped decay (min(d, (1+n)/(10+n))): forgets the random init fast
        # instead of carrying its bias for ~1/(1-d) dispatches.
        nonlocal ema, ema_updates
        if not use_ema:
            return
        ema_updates += 1
        d = min(0.999 ** steps_in_dispatch,
                (1.0 + ema_updates) / (10.0 + ema_updates))
        ema = _ema_update(ema, st, d)

    # Device-resident dataset (single-accelerator path): per-step host
    # batching is pathological here twice over: the one-core host + tunneled
    # TPU make each 6 MB transfer cost ~180 ms (10x the step's compute), and
    # the tunnel client leaks its transfer buffer (~9 GB host RSS per epoch,
    # host-OOM on long runs). So the train split ships ONCE and batches gather
    # inside the jitted step, like the fused loop's ring buffer:
    #  - frames are stored FLAT [N, H*W*3] (the [N,88,200,3] layout's TPU tile
    #    padding expanded a 10.7 GB array by ~1.3x and OOMed the chip);
    #  - the resident train split is capped at ~8.4 GB (stratified subsample
    #    beyond that; see cap_train below) and epoch validation uses a
    #    resident subset; run the full-split offline eval with cli/report
    #    afterwards.
    # Multi-device meshes keep host batching with a prefetch thread (the batch
    # shards over the data axis).
    dev_resident = n_dev == 1
    res_mode = resident is not None
    val_rows = None  # res_mode only: rows of the val split in val_table
    if res_mode:
        assert n_dev == 1, "resident-table training is the single-chip path"
        from cilrs_tpu.ops.gather import LANE, gather_rows_paged

        img_shape = tuple(resident["image_shape"])
        D = int(np.prod(img_shape))
        # Paged images (data/resident.py): a tuple of sub-2^33-byte pages
        # routed by page_rows. A bare array (legacy tools / val snapshots)
        # is a single page.
        page_rows = int(resident.get("page_rows", 0))
        dev_train = {
            k: resident[k] for k in ("images", "speed", "command", "controls")
        }
        if not isinstance(dev_train["images"], tuple):
            dev_train["images"] = (dev_train["images"],)
        resident = None  # must not pin the table once refresh_fn swaps it

        def _gather(dds, idx):
            b = {k: v[idx] for k, v in dds.items() if k != "images"}
            pages = dds["images"]
            pages = pages if isinstance(pages, tuple) else (pages,)
            b["images"] = gather_rows_paged(pages, idx, page_rows)[:, :D].reshape(
                (idx.shape[0],) + img_shape)
            return b

        # Val rows snapshot into an independent compact table (~val_fraction
        # of the collection): what val_loss measures never changes when
        # refresh_fn swaps the train table underneath.
        @jax.jit
        def _snap_val(dds, idx):
            rows = gather_rows_paged(dds["images"], idx, page_rows)  # [V, D_pad]
            return {
                "images": rows.reshape(rows.shape[0], -1, LANE),
                "speed": dds["speed"][idx],
                "command": dds["command"][idx],
                "controls": dds["controls"][idx],
            }

        if refresh_fn is None:
            # Fixed table: the val rows never change, so evaluating straight
            # from the collection table by global index is free — the
            # independent snapshot would add ~val_fraction of the table's
            # footprint for nothing (at 200K frames: +1.6 GB on top of the
            # 10.6 GB table, which OOMed the chip at the first validation).
            dev_val = dev_train
            val_rows = np.asarray(val_idx)
        else:
            dev_val = jax.block_until_ready(
                _snap_val(dev_train, jnp.asarray(val_idx)))
            val_rows = np.arange(len(val_idx))

        def _gather_group(dds, idxs):  # idxs [K, B] -> dict of [K, B, ...]
            b = _gather(dds, idxs.reshape(-1))
            return jax.tree.map(
                lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

        @functools.partial(jax.jit, donate_argnums=0)
        def _train_steps_dev(state, dds, idxs, rng):  # idxs [K, B] global
            def body(st, batch):
                st2, parts = base_train_step(st, batch, rng)
                return st2, parts["loss"]

            return jax.lax.scan(body, state, _gather_group(dds, idxs))

        @jax.jit
        def _eval_steps_dev(state, dds, idxs):  # idxs [K, B] global
            def body(_, batch):
                parts = base_eval_step(state, batch)
                return None, (parts["loss"], parts["cmd_steer_err_sum"],
                              parts["cmd_count"])

            _, outs = jax.lax.scan(body, None, _gather_group(dds, idxs))
            return outs

        # MULTI-PAGE tables split the paged gather into its OWN dispatch and
        # let the train/eval scans consume the pre-gathered batch stack.
        # Motivation (RESULTS_training.md round 6): every run whose fused
        # train dispatch gathered page-2 rows collapsed turn learning — r5f,
        # r6a (fresh healthy world in page 2), late_only — while page-1-only
        # training and every STANDALONE gather structure measured bit-exact
        # (cross_eval, train_gather_probe) — i.e. the fusion of the 2-page
        # Mosaic gathers with the donated 25-step train scan miscomputes in
        # a way instrumentation masks. The split reproduces exactly the
        # program structures that audit clean, at the cost of one extra
        # dispatch per 25 steps (~100 ms tunnel RTT, ~5% of the group's
        # device time) and a transient [K*B] frame buffer (~160 MB).
        # Single-page tables keep the proven fused path (bit-reproduces the
        # 150k flagship). CILRS_TPU_FUSED_GATHER=1 forces the old fused path
        # on multi-page tables too (the collapse-reproduction A/B arm).
        split_gather = (len(dev_train["images"]) > 1
                        and os.environ.get("CILRS_TPU_FUSED_GATHER") != "1")

        @jax.jit
        def _gather_only(dds, idxs):
            return _gather_group(dds, idxs)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _train_steps_pre(state, batches, rng):
            def body(st, batch):
                st2, parts = base_train_step(st, batch, rng)
                return st2, parts["loss"]

            return jax.lax.scan(body, state, batches)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _eval_steps_pre(state, batches):
            def body(_, batch):
                parts = base_eval_step(state, batch)
                return None, (parts["loss"], parts["cmd_steer_err_sum"],
                              parts["cmd_count"])

            _, outs = jax.lax.scan(body, None, batches)
            return outs

        if split_gather:
            train_steps = lambda state, i, rng: _train_steps_pre(
                state, _gather_only(dev_train, i), rng)
            eval_steps = lambda state, i: _eval_steps_pre(
                state, _gather_only(dev_val, i))
        else:
            train_steps = lambda state, i, rng: _train_steps_dev(state, dev_train, i, rng)
            eval_steps = lambda state, i: _eval_steps_dev(state, dev_val, i)
    elif dev_resident:
        frame_bytes = int(np.prod(ds.images.shape[1:]))
        # 16 GB v5e HBM minus model+opt (~0.3 GB) and step workspace: the flat
        # uint8 layout has no tile padding, so a 180K-frame dataset's full 85%
        # train split (~8.1 GB) fits resident. The old 5.5 GB cap predates the
        # flat layout and silently dropped a third of the train split.
        cap_train = int(8.4e9 // frame_bytes)
        cap_val = int(0.5e9 // frame_bytes)
        rng_np = np.random.RandomState(cfg.training.seed + 5)
        if len(train_idx) > cap_train:
            sel = rng_np.choice(len(train_idx), cap_train, replace=False)
            train_idx = train_idx[np.sort(sel)]
            if verbose:
                print(f"  resident train subset: {cap_train} frames (8.4 GB HBM cap)",
                      flush=True)
        val_res = (val_idx if len(val_idx) <= cap_val else
                   val_idx[np.sort(rng_np.choice(len(val_idx), cap_val,
                                                 replace=False))])

        from cilrs_tpu.ops.gather import LANE, gather_rows, padded_row_elems

        img_shape = ds.images.shape[1:]
        D = int(np.prod(img_shape))
        # Tile-dense padding (not just 128-lane): a non-dense tiled table
        # layout forces XLA to copy the WHOLE table in front of the Mosaic
        # kernel (ops/gather.py:sublane_multiple).
        D_pad = padded_row_elems(D, ds.images.dtype)

        def _ship(idx):
            # Frames ship PRE-BLOCKED [N, R, 128] (gather_rows' layout): a 2D
            # [N, D] table reshaped under jit costs a full-table relayout copy
            # on TPU (7.7 GB at this size). Fill in chunks so the host-side
            # fancy-index temp stays small.
            n = len(idx)
            blk = np.zeros((n, D_pad // LANE, LANE), ds.images.dtype)
            flat = blk.reshape(n, -1)
            for s in range(0, n, 16384):
                sub = idx[s : s + 16384]
                flat[s : s + len(sub), :D] = ds.images[sub].reshape(len(sub), -1)
            return {
                "images": jax.device_put(blk),
                "speed": jax.device_put(ds.speed_norm[idx]),
                "command": jax.device_put(ds.command[idx]),
                "controls": jax.device_put(ds.controls[idx]),
            }

        dev_train = _ship(train_idx)
        dev_val = _ship(val_res)

        def _gather(dds, idx):
            # Frames gather through the Pallas row-gather kernel: XLA's own
            # lowering of `table[idx]` at this size materializes a full layout
            # copy of the table plus a half-column slice temp (~2.5x the
            # table's footprint -> chip OOM at the 8.4 GB cap); the kernel
            # DMAs exactly the requested rows (ops/gather.py).
            b = {k: v[idx] for k, v in dds.items() if k != "images"}
            b["images"] = gather_rows(dds["images"], idx)[:, :D].reshape(
                (idx.shape[0],) + img_shape)
            return b

        # dds is a jit ARGUMENT, never closed over: captured arrays become
        # jaxpr constants and the whole dataset would be re-shipped with the
        # compiled program (see load_policy's docstring for the same footgun).
        # K steps scan inside ONE dispatch: per-call tunnel latency (~100 ms
        # through the axon TPU link) dominated the r2 epoch time (822 frames/s
        # at batch 120 = one RTT per step); amortizing it K-fold is the whole
        # VERDICT-r2 item 5 fix.
        def _gather_group(dds, idxs):  # idxs [K, B] -> dict of [K, B, ...]
            # The gather runs BEFORE the scan, not in its body: a while loop
            # that references the resident table takes it as loop state, and
            # XLA inserts a defensive full-table copy of any non-donated
            # argument owned by a while loop (7.7 GB here -> chip OOM). One
            # kernel call fetches all K batches (~160 MB), and the scan
            # carries only that.
            b = _gather(dds, idxs.reshape(-1))
            return jax.tree.map(
                lambda a: a.reshape(idxs.shape + a.shape[1:]), b)

        @functools.partial(jax.jit, donate_argnums=0)
        def _train_steps_dev(state, dds, idxs, rng):  # idxs [K, B]
            def body(st, batch):
                st2, parts = base_train_step(st, batch, rng)
                return st2, parts["loss"]

            return jax.lax.scan(body, state, _gather_group(dds, idxs))

        @jax.jit
        def _eval_steps_dev(state, dds, idxs):  # idxs [K, B]
            def body(_, batch):
                parts = base_eval_step(state, batch)
                return None, (parts["loss"], parts["cmd_steer_err_sum"],
                              parts["cmd_count"])

            _, outs = jax.lax.scan(body, None, _gather_group(dds, idxs))
            return outs

        train_steps = lambda state, i, rng: _train_steps_dev(state, dev_train, i, rng)
        eval_steps = lambda state, i: _eval_steps_dev(state, dev_val, i)
    else:
        train_step = jax.jit(base_train_step, donate_argnums=0)
        eval_step = jax.jit(base_eval_step)

    sampler = WeightedBatchSampler(
        ds.command[train_idx], B, sseed,
        controls=ds.controls[train_idx],
        hard_boost=cfg.training.hard_frame_boost,
    )
    rng = jax.random.PRNGKey(sseed + 1)

    history = []
    patience = 0
    refresh_round = 1
    STEPS_PER_CALL = 25
    for epoch in range(start_epoch, cfg.training.epochs):
        t0 = time.time()
        train_losses = []
        if dev_resident:
            # `it` are LOCAL positions within train_idx. The shipped-split
            # path stores arrays in train_idx order (local == row); the
            # shared-table path indexes the one collection table globally.
            its = list(sampler.epoch(spe))
            for s in range(0, len(its), STEPS_PER_CALL):
                grp = np.stack(its[s : s + STEPS_PER_CALL])
                if res_mode:
                    grp = train_idx[grp]
                state, losses = train_steps(state, jnp.asarray(grp), rng)
                _ema_after(state, len(grp))
                train_losses.append(losses)  # [K] device array; sync at epoch end
        else:
            batches = _prefetch(
                sampler.epoch(spe),
                lambda it: _device_batch(ds, train_idx[it], bspec))
            for batch in batches:
                state, parts = train_step(state, batch, rng)
                _ema_after(state, 1)
                train_losses.append(parts["loss"])
        train_loss = float(np.mean(np.concatenate(
            [np.atleast_1d(np.asarray(l)) for l in train_losses])))

        # Validation (full pass, fixed order) on the EMA iterate when enabled —
        # the deployed params are then exactly what the val numbers measured.
        # When the val split is smaller than one batch, wrap around so at
        # least one (padded) batch runs.
        eval_state = (state.replace(params=ema["params"],
                                    batch_stats=ema["batch_stats"])
                      if use_ema else state)
        if res_mode:
            vsrc = val_rows  # rows into the val table (snapshot or shared)
        elif dev_resident:
            vsrc = np.arange(len(val_res))
        else:
            vsrc = val_idx
        if len(vsrc) < B:
            val_iter = [np.resize(vsrc, B)]
        else:
            val_iter = [vsrc[s : s + B] for s in range(0, len(vsrc) - B + 1, B)]

        def _run_val(st):
            val_losses, err_sum, cnt = [], np.zeros(4), np.zeros(4)
            if dev_resident:
                # Dispatches of <= 50 batches: each group's row gather stays
                # small (<= 6k rows, ~320 MB out) instead of materializing the
                # whole val split's frames (1.4 GB+) in one gather — both an
                # HBM-peak bound and part of the big-table hygiene (no huge
                # single gather calls; see ops/gather.gather_rows_paged).
                # CILRS_TPU_EVAL_ONESHOT=1 restores the round-3 single-
                # dispatch eval (A/B arm for the eval-interleaving suspect).
                vi = np.stack(val_iter)
                step = len(vi) if os.environ.get(
                    "CILRS_TPU_EVAL_ONESHOT") == "1" else 50
                for s in range(0, len(vi), step):
                    losses, errs, cnts = eval_steps(st, jnp.asarray(vi[s:s + step]))
                    val_losses += [float(l) for l in np.asarray(losses)]
                    err_sum += np.asarray(errs).sum(axis=0)
                    cnt += np.asarray(cnts).sum(axis=0)
            else:
                for parts in (eval_step(st, b) for b in _prefetch(
                        val_iter, lambda vidx: _device_batch(ds, vidx, bspec))):
                    val_losses.append(float(parts["loss"]))
                    err_sum += np.asarray(parts["cmd_steer_err_sum"])
                    cnt += np.asarray(parts["cmd_count"])
            vl = float(np.mean(val_losses)) if val_losses else float("nan")
            return vl, err_sum, cnt

        # eval_every > 1 skips epoch-end validation on off epochs (always
        # validates the final epoch). Two uses: cheaper long runs, and the
        # round-6 eval-causality experiments (a no-eval training run whose
        # offline report is healthy pins the collapse on the interleaved
        # eval dispatch itself).
        do_eval = ((epoch + 1) % max(eval_every, 1) == 0
                   or epoch + 1 == cfg.training.epochs)
        if do_eval:
            val_loss, err_sum, cnt = _run_val(eval_state)
            # Raw-iterate val alongside the EMA one: one extra ~2 s pass that
            # makes an EMA that lags or diverges visible immediately instead
            # of surfacing as a mysteriously flat best-val.
            val_loss_raw = _run_val(state)[0] if use_ema else val_loss
        else:
            val_loss = val_loss_raw = float("nan")
            err_sum, cnt = np.zeros(4), np.zeros(4)
        cmd_err = {COMMAND_NAMES[i]: float(err_sum[i] / max(cnt[i], 1)) for i in range(4)}

        ep_time = time.time() - t0
        history.append({
            "epoch": epoch + 1, "train_loss": train_loss, "val_loss": val_loss,
            "val_loss_raw": val_loss_raw, "time_s": ep_time,
            **{f"steer_err_{k}": v for k, v in cmd_err.items()},
        })
        if verbose:
            raw_note = f" raw {val_loss_raw:.4f}" if use_ema else ""
            print(f"  epoch {epoch + 1}/{cfg.training.epochs}: train {train_loss:.4f} "
                  f"val {val_loss:.4f}{raw_note} ({ep_time:.1f}s) cmd_err {cmd_err}")

        # Deploy whichever iterate the val pass actually scored lower: the EMA
        # wins early (smooths SGD noise) but late in the anneal it lags the
        # raw iterate (r3f: raw 0.0643 vs EMA 0.0683 at epoch 23).
        cand_val, cand_state = val_loss, eval_state
        if use_ema and val_loss_raw < cand_val:
            cand_val, cand_state = val_loss_raw, state
        improved = do_eval and cand_val < best_val
        if improved:
            best_val = cand_val
            patience = 0
        elif do_eval:  # skipped-eval epochs advance neither patience nor best
            patience += 1
        if ckpt_dir:
            # Best slot on improvement; rolling latest slot (resume point)
            # only every ckpt_every epochs + at the end — each slot write
            # costs a ~75 s train-state pull through the tunnel.
            want_latest = ((epoch + 1) % ckpt_every == 0
                           or epoch + 1 == cfg.training.epochs
                           or patience >= cfg.training.early_stop_patience)
            if want_latest:
                # Latest slot = RAW resume state (resuming from averaged
                # params would restart optimization off-trajectory).
                ckpt.save_checkpoint(
                    ckpt_dir, state, epoch + 1, val_loss,
                    extra={"cmd_steer_errors": cmd_err}, is_best=False,
                    latest=True)
            if improved:
                # Best slot = the params the val pass actually measured
                # (EMA or raw, whichever won) — the deployment artifact.
                ckpt.save_checkpoint(
                    ckpt_dir, cand_state, epoch + 1, cand_val,
                    extra={"cmd_steer_errors": cmd_err}, is_best=True,
                    latest=False)
        if ckpt_dir:
            # Rewritten every epoch (a few KB): a run killed mid-way keeps
            # its learning curve — r3b died at epoch 18 and left nothing.
            _write_history(os.path.join(ckpt_dir, "training_history.csv"), history)
        if patience >= cfg.training.early_stop_patience:
            if verbose:
                print(f"  early stop at epoch {epoch + 1}")
            break
        if (res_mode and refresh_fn is not None and refresh_every > 0
                and (epoch + 1) % refresh_every == 0
                and epoch + 1 < cfg.training.epochs):
            dev_train = None  # free the multi-GB table before collecting anew
            t_r = time.time()
            new_table, new_ds = refresh_fn(refresh_round)
            refresh_round += 1
            if int(new_table.get("page_rows", 0)) != page_rows:
                # The compiled gather programs bake page_rows in as a
                # constant; a refresh table with a different page layout
                # would silently route rows to the wrong page.
                raise ValueError(
                    f"refresh table page_rows {new_table.get('page_rows')} "
                    f"!= initial {page_rows}: refresh collections must use "
                    "the same frame count / page layout as the initial one")
            dev_train = {k: new_table[k]
                         for k in ("images", "speed", "command", "controls")}
            if not isinstance(dev_train["images"], tuple):
                dev_train["images"] = (dev_train["images"],)
            del new_table
            train_idx = np.arange(len(new_ds))
            sampler = WeightedBatchSampler(
                new_ds.command, B, cfg.training.seed + 131 * refresh_round,
                controls=new_ds.controls,
                hard_boost=cfg.training.hard_frame_boost)
            if verbose:
                print(f"  train table refreshed: {len(new_ds)} fresh frames "
                      f"({time.time() - t_r:.0f}s)", flush=True)

    if ckpt_dir:
        _write_history(os.path.join(ckpt_dir, "training_history.csv"), history)
        try:
            from cilrs_tpu.train.plots import plot_training_curves

            plot_training_curves(history, os.path.join(ckpt_dir, "training_curves.png"))
        except Exception as e:  # matplotlib optional
            if verbose:
                print(f"  (training curves skipped: {e})")
    # `state` is the raw final iterate (resume point); `eval_state` carries
    # the deployed params — the EMA average when enabled, else the same state.
    final_eval = (state.replace(params=ema["params"],
                                batch_stats=ema["batch_stats"])
                  if use_ema else state)
    return {"history": history, "best_val_loss": best_val, "state": state,
            "eval_state": final_eval,
            # The val snapshot outlives any refresh: callers run the offline
            # report against it (the original shared table may be long gone).
            # With a fixed table this IS the collection table; val_rows maps
            # the val split into it either way.
            "val_table": (dict(dev_val, image_shape=img_shape,
                               page_rows=page_rows)
                          if res_mode else None),
            "val_rows": val_rows if res_mode else None}


def _write_history(path: str, history: list[dict]):
    if not history:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(history[0].keys()))
        w.writeheader()
        w.writerows(history)
