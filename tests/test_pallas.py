"""Pallas row-gather kernel vs XLA's `table[idx]` (interpret mode on CPU; the
compiled kernel is the default resident-dataset path in train/loop.py on TPU).

Why the kernel exists: XLA's lowering of a batch gather from a multi-GB
device-resident table materializes a layout copy of the WHOLE table plus a
half-column slice temp (~2.5x the table's footprint), which OOMs a 16 GB v5e
at the full 8 GB train split. gather_rows DMAs exactly the requested rows
(scalar-prefetched indices drive the BlockSpec index_map), so peak extra
memory is two double-buffered row blocks in VMEM.
"""

import numpy as np
import jax.numpy as jnp

from cilrs_tpu.ops.gather import LANE, gather_rows, pad_rows


def test_gather_rows_matches_xla():
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.randint(0, 255, (257, 384), dtype=np.uint8))
    idx = jnp.asarray(rng.randint(0, 257, (64,)), dtype=jnp.int32)
    out = gather_rows(tbl, idx, interpret=True)
    assert out.shape == (64, 384)
    assert out.dtype == tbl.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl[idx]))


def test_gather_rows_float_and_repeats():
    rng = np.random.RandomState(1)
    tbl = jnp.asarray(rng.randn(100, 256).astype(np.float32))
    idx = jnp.asarray([0, 0, 99, 5, 5, 5, 42, 0], dtype=jnp.int32)
    out = gather_rows(tbl, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl[idx]))


def test_gather_rows_clamps_out_of_range():
    tbl = jnp.asarray(np.arange(10 * LANE, dtype=np.float32).reshape(10, LANE))
    idx = jnp.asarray([-3, 12], dtype=jnp.int32)
    out = gather_rows(tbl, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(tbl[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(tbl[9]))


def test_pad_rows_and_train_frame_shape():
    # The exact shape the train loop uses: 88*200*3 = 52800 -> 52864 lanes.
    rng = np.random.RandomState(2)
    tbl = jnp.asarray(rng.randint(0, 255, (16, 88 * 200 * 3), dtype=np.uint8))
    padded = pad_rows(tbl)
    assert padded.shape[1] % LANE == 0
    idx = jnp.asarray([3, 1, 15], dtype=jnp.int32)
    out = gather_rows(padded, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out[:, : tbl.shape[1]]), np.asarray(tbl[idx]))
