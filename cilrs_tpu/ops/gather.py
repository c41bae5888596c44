"""Pallas TPU kernel: zero-copy batch row-gather from a device-resident table.

The training loop keeps the whole uint8 frame dataset resident in HBM as one
flat [N, D] table and gathers each batch's rows inside the jitted step
(train/loop.py). XLA's lowering of that gather is pathological at this size:
it materializes a LAYOUT COPY of the full table (7.6 GB for a 176K-frame
dataset) plus a half-column "mini-gather" slice temp (3.8 GB) — 2.5x the
table's own footprint, which is what forced round 2's 5.5 GB resident cap and
silently dropped a third of the train split (VERDICT r2, items 1/5).

This kernel is the TPU-native fix: scalar-prefetched indices drive the
BlockSpec index_map, so each grid step issues one direct HBM->VMEM DMA of row
``idx[i]`` and writes it straight to the output block. No table copy, no temp
— peak extra memory is two double-buffered 52 KB row blocks in VMEM. This is
the embedding-lookup pattern from the Pallas TPU playbook
(PrefetchScalarGridSpec), and it BEATS the XLA path outright: same bytes
moved, none of the 11.4 GB of HLO temps.

Rows are padded to a multiple of 128 lanes (and the row reshaped to
[R, 128]) so blocks are cleanly tileable for u8.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def sublane_multiple(dtype) -> int:
    """Sublane count that makes a [N, R, 128] block's tiled layout DENSE.

    TPU tiles are (8, 128) with (4,1)/(2,1) packing for 1/2-byte dtypes, so a
    [R, 128] slab is stored without padding only when R is a multiple of 32
    (u8), 16 (bf16) or 8 (f32). This matters beyond wasted bytes: when the
    tiled layout has internal padding it differs from the linear layout the
    Mosaic custom call constrains its operands to, and XLA inserts a COPY OF
    THE WHOLE TABLE right before the kernel (measured: full-table temp at
    R=413, zero temps at R=416). Pad rows with padded_row_elems before
    shipping a large table.
    """
    return {1: 32, 2: 16, 4: 8, 8: 4}[np.dtype(dtype).itemsize]


def padded_row_elems(d: int, dtype) -> int:
    """Smallest row size >= d that gathers copy-free (LANE*sublane aligned)."""
    unit = LANE * sublane_multiple(dtype)
    return d + ((-d) % unit)


def pad_rows(table: jnp.ndarray) -> jnp.ndarray:
    """Pad [N, D] so D is tile-dense for gather_rows (see sublane_multiple)."""
    n, d = table.shape
    pad = padded_row_elems(d, table.dtype) - d
    if pad == 0:
        return table
    return jnp.pad(table, ((0, 0), (0, pad)))


def _kernel(idx_ref, tbl_ref, out_ref):
    # The index_map already routed the right table row into tbl_ref; the
    # kernel body is a pure VMEM->VMEM block copy.
    del idx_ref
    out_ref[...] = tbl_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_rows_impl(table, idx, interpret):
    n, r, lane = table.shape
    b = idx.shape[0]
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, r, lane), lambda i, idx_ref: (idx_ref[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, r, lane), lambda i, idx_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, r, lane), table.dtype),
        interpret=interpret,
    )(idx, table)
    return out


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool | None = None) -> jnp.ndarray:
    """Gather rows idx [B] i32 from a resident table -> [B, D] of table.dtype.

    ``table`` is PRE-BLOCKED [N, R, 128] (ship it to the device in that shape:
    a [N, D] -> [N, R, 128] reshape under jit is NOT a bitcast under TPU tiling
    — XLA materializes a layout copy of the whole multi-GB table, the exact
    pathology this kernel exists to avoid). A 2D [N, D] table (D % 128 == 0)
    is accepted for small tables/tests and reshaped here.

    Out-of-range indices are clamped (matching jnp's default TPU gather
    semantics closely enough for sampler-produced in-range indices).
    interpret=None auto-selects: compiled Mosaic on TPU, interpret elsewhere
    (CPU fallback so the resident train path still runs off-TPU). Inside an
    outer trace the backend can't be sniffed from the arrays, so this checks
    the process default backend once.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if table.ndim == 2:
        n, d = table.shape
        if d % LANE != 0:
            raise ValueError(f"row size {d} must be a multiple of {LANE}; use pad_rows")
        table = table.reshape(n, d // LANE, LANE)
    out = _gather_rows_impl(table, idx, interpret)
    # [B, R, 128] -> [B, D]: a relayout copy of just the BATCH (a few MB).
    return out.reshape(out.shape[0], -1)


# Hard per-page ceiling for paged tables. Every training run whose epoch-end
# eval issued a single row-gather crossing the 2^33-byte table offset
# collapsed on LEFT/RIGHT steering (5/5: r3g, r3l, r3n, r4e, r4f), while
# bit-level audits cleared the data, the standalone reads, and the train
# dispatch (RESULTS_training.md "Round 4"). 2^33 bytes = 2^31 4-byte words —
# the signature of a 32-bit word-offset overflow somewhere below the Mosaic
# gather. Paging keeps every gather's source operand strictly below the line.
PAGE_BYTE_LIMIT = 2 ** 33


def gather_rows_paged(pages, idx: jnp.ndarray, page_rows: int,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Gather global rows from a PAGED table -> [B, D].

    ``pages`` is a sequence of [n_p, R, 128] arrays, each strictly under
    PAGE_BYTE_LIMIT bytes (data/resident.py sizes them); global row ``g``
    lives at pages[g // page_rows][g % page_rows]. Non-final pages hold
    exactly ``page_rows`` logical rows, so the page route is pure index math.

    One gather_rows call per page with the non-member lanes parked on row 0,
    then a predicated select: for the production 2-page tables this costs 2x
    the batch's DMA bytes (a few hundred MB per 25-step train group — noise
    next to the ResNet fwd+bwd), and NO gather ever sees an operand at or
    past the 2^33-byte offset.
    """
    pages = tuple(pages)
    if len(pages) == 1:
        return gather_rows(pages[0], idx, interpret)
    idx = idx.astype(jnp.int32)
    page = idx // page_rows
    local = idx - page * page_rows
    out = None
    for i, pg in enumerate(pages):
        sel = page == i
        g = gather_rows(pg, jnp.where(sel, local, 0), interpret)
        out = g if out is None else jnp.where(sel[:, None], g, out)
    return out


def paged_layout(num_rows: int, row_bytes: int, slack_rows: int,
                 max_page_bytes: int = PAGE_BYTE_LIMIT):
    """(num_pages, page_rows, page_slots) for a table of ``num_rows`` logical
    rows where every page needs ``slack_rows`` physical slack (collection DUS
    overshoot) and must stay strictly under ``max_page_bytes``.

    Pages are balanced (equal physical size) so the collection chunk program
    compiles ONCE and is reused for every page.
    """
    max_slots = max_page_bytes // row_bytes  # slots * row_bytes could == limit
    if max_slots * row_bytes >= max_page_bytes:
        max_slots -= 1  # strictly under
    max_logical = max_slots - slack_rows
    if max_logical <= 0:
        raise ValueError(
            f"slack ({slack_rows} rows) leaves no room under the "
            f"{max_page_bytes}-byte page limit at {row_bytes} B/row")
    num_pages = -(-num_rows // max_logical)
    page_rows = -(-num_rows // num_pages)
    page_slots = page_rows + slack_rows
    assert page_slots * row_bytes < max_page_bytes
    return num_pages, page_rows, page_slots
