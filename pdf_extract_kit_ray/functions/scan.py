"""Distributed ordered prefix scan (global cumulative sum / row_number).

Ray Data has no scan operator: ``groupby`` gives per-key aggregation and
``sort`` gives global order, but nothing computes "the sum of every row
BEFORE this one in global key order" — the primitive behind sequence
packing (global token offsets), global ranks (row_number for a
deterministic training shuffle), ntile bucketing, and watermarking.

This is the classic two-phase parallel scan, expressed in Dataset ops:

1. **Bucket partials** (map + tiny groupby): every row maps to an
   order-preserving bucket id (``bucket_fn``; bucket order must agree with
   ``sort_cols`` order).  A vectorized per-batch combiner emits one
   ``(bucket, partial_sum)`` row per distinct bucket per batch, a
   ``groupby(bucket).sum`` reduces those, and the driver pulls the result —
   **bounded by the bucket count** (<= ``max_buckets``, a few KB), never by
   the row count.
2. **Broadcast + in-bucket scan** (one hash shuffle): the exclusive
   per-bucket prefixes broadcast to every task (``ray.put``, read once per
   group); rows shuffle once on bucket id, each group sorts by
   ``sort_cols`` and adds ``prefix[bucket] + cumsum_exclusive(value)``.

Scale contract: driver state is O(max_buckets) ints; each phase-2 group
holds ~rows/n_buckets rows — size ``bucket_fn``'s range so a group fits a
worker's heap (at 10^12 rows, 65,536 buckets -> ~15M int rows/group, ~100s
of MB; widen the bucket key for more).  The value column must be int64;
sums are exact (numpy int64 accumulation, no float path).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_BUCKET_COL = "__scan_bucket"


def ordered_prefix_scan(
    ds: "ray.data.Dataset",
    sort_cols: List[str],
    bucket_fn: Callable[[pa.Table], np.ndarray],
    *,
    value_col: Optional[str] = None,
    out_col: str = "prefix",
    max_buckets: int = 1 << 16,
    op: str = "sum",
) -> "ray.data.Dataset":
    """Append ``out_col`` = exclusive prefix ``op`` of ``value_col`` (or of
    1 per row when ``value_col`` is None — i.e. the 0-based global
    row_number) over the global ``sort_cols`` ascending order.

    ``op`` is ``"sum"`` (default) or ``"max"`` — prefix max is the
    WATERMARK primitive (running max of event time over arrival order);
    its exclusive form yields NULL for the globally-first row, matching
    SQL's ``max(x) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)``.

    ``bucket_fn(batch) -> int64 ndarray`` must be monotone with respect to
    the sort order: every row of bucket b sorts before every row of bucket
    b+1.  ``sort_cols`` must be a total order (include a unique tie-break
    column); within-bucket ordering uses ``pyarrow.compute.sort_indices``
    so string keys sort bytewise exactly like SQL ``ORDER BY``.
    """

    if op not in ("sum", "max"):
        raise ValueError(f"ordered_prefix_scan: unknown op {op!r}")
    _SENTINEL = np.iinfo(np.int64).min   # -inf identity for prefix max

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "partial": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        b = np.asarray(bucket_fn(batch), dtype=np.int64)
        if value_col is None:
            v = np.ones(len(b), dtype=np.int64)
        else:
            v = batch.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        if op == "sum":
            sums = np.zeros(len(ub), dtype=np.int64)
            np.add.at(sums, inv, v)
        else:
            sums = np.full(len(ub), _SENTINEL, dtype=np.int64)
            np.maximum.at(sums, inv, v)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "partial": pa.array(sums, pa.int64())})

    from .agg import coarse_grouped_aggregate
    bucket_sums = coarse_grouped_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        "bucket", [("partial", op, "total")])
    # Bounded driver pull: one row per DISTINCT bucket (<= max_buckets).
    rows = bucket_sums.take_all()
    if len(rows) > max_buckets:
        raise ValueError(
            f"bucket_fn produced {len(rows)} buckets > max_buckets="
            f"{max_buckets}; widen bucket granularity deliberately")
    rows.sort(key=lambda r: r["bucket"])
    ids = np.array([r["bucket"] for r in rows], dtype=np.int64)
    sums = np.array([r["total"] for r in rows], dtype=np.int64)
    if op == "sum":
        excl = np.cumsum(sums) - sums
    else:
        run = np.maximum.accumulate(sums)
        excl = np.r_[_SENTINEL, run[:-1]]
    prefix_ref = ray.put((ids, excl))

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = np.asarray(bucket_fn(batch), dtype=np.int64)
        return batch.append_column(_BUCKET_COL, pa.array(b, pa.int64()))

    sort_keys = [(c, "ascending") for c in sort_cols]

    def scan_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns([_BUCKET_COL]).append_column(
                out_col, pa.array([], pa.int64()))
        idx = pc.sort_indices(group, sort_keys=sort_keys)
        g = group.take(idx)
        if value_col is None:
            v = np.ones(g.num_rows, dtype=np.int64)
        else:
            v = g.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        bids, excls = ray.get(prefix_ref)
        bucket = g.column(_BUCKET_COL)[0].as_py()
        base = int(excls[np.searchsorted(bids, bucket)])
        if op == "sum":
            cum = np.cumsum(v) - v + base
            out_arr = pa.array(cum, pa.int64())
        else:
            run = np.maximum.accumulate(v)
            cum = np.maximum(np.r_[np.int64(base), run[:-1]],
                             np.int64(base))
            out_arr = pa.array(
                np.where(cum == np.iinfo(np.int64).min, 0, cum),
                pa.int64(),
                mask=(cum == np.iinfo(np.int64).min))
        return g.drop_columns([_BUCKET_COL]).append_column(
            out_col, out_arr)

    return (ds.map_batches(with_bucket, batch_format="pyarrow")
              .groupby(_BUCKET_COL)
              .map_groups(scan_group, batch_format="pyarrow"))


def int_range_buckets(col: str, lo: int, hi: int,
                      n_buckets: int = 1 << 12) -> Callable[[pa.Table], np.ndarray]:
    """Order-preserving bucket_fn for an integer key column spanning
    [lo, hi]: equal-width ranges, ``n_buckets`` of them."""
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def fn(batch: pa.Table) -> np.ndarray:
        k = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        return (k - lo) // width

    return fn


def hex_prefix_buckets(col: str, n_hex: int = 4) -> Callable[[pa.Table], np.ndarray]:
    """Order-preserving bucket_fn for a lowercase-hex string key column
    (e.g. an md5): the first ``n_hex`` hex chars as an int (16^n_hex
    buckets).  Bytewise hex order == integer order, so bucket order agrees
    with ``ORDER BY col``."""

    def fn(batch: pa.Table) -> np.ndarray:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # Vectorized hex decode straight off the Arrow string buffer (no
        # per-row int(p, 16)): gather the first n_hex bytes of each row,
        # map ascii -> nibble, horner-combine.
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=len(arr) + 1, offset=arr.offset * 4)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        pos = off[:-1, None].astype(np.int64) + np.arange(n_hex)
        ch = data[pos]
        nib = np.where(ch >= ord("a"), ch - (ord("a") - 10),
                       ch - ord("0")).astype(np.int64)
        shifts = 4 * np.arange(n_hex - 1, -1, -1, dtype=np.int64)
        return (nib << shifts).sum(axis=1)

    return fn
