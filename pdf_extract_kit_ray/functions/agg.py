"""Coarse-grouped Arrow aggregation — the high-cardinality groupby shape.

``Dataset.groupby(key).aggregate(...)`` pays per-GROUP Python dispatch in
its reduce stage: at ~150k distinct keys the big_orders per-order rollup
spent 10.6 s in the Aggregate operator at sf0.1 (measured; the map side was
1.2 s).  For aggregations whose combine is an Arrow ``Table.group_by``
kernel (sum/min/max/count), the scale-safe shape is:

    partial-combine per batch  ->  ONE shuffle on a COARSE key
    (hash(key) % num_coarse)   ->  per-bucket Arrow C++ group_by

so Python dispatch is per COARSE BUCKET (dozens), not per key, and the
per-key work runs in Arrow's hash-aggregate kernel.  Same result rows,
7x faster at 472k partial rows / 147k keys (and the gap widens with key
count).

``num_coarse`` sizes bucket occupancy: each bucket materializes in one
reduce task, so pick ~ expected_rows / 4096 (the `_num_coarse` policy) at
scale; the default targets a single-node bench.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

_GOLDEN = np.int64(0x9E3779B1)


def _default_num_coarse() -> int:
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(32, 4 * cpus)


def _coarse_of(key: "pa.ChunkedArray | pa.Array",
               num_coarse: int) -> np.ndarray:
    if pa.types.is_integer(key.type):
        k = key.to_numpy(zero_copy_only=False).astype(np.int64)
        return (k * _GOLDEN) % num_coarse
    from ..pipelines.dedup import _string_coarse_hash
    return _string_coarse_hash(
        key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key,
        num_coarse)


def coarse_grouped_aggregate(
    ds: "ray.data.Dataset",
    key_cols: "str | List[str]",
    aggs: List[Tuple[Optional[str], str, str]],
    num_coarse: Optional[int] = None,
    hash_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Group ``ds`` by ``key_cols`` applying Arrow group_by aggregations.

    ``aggs``: (value_col, arrow_fn, out_name) triples — arrow_fn is an
    Arrow hash-aggregate name ("sum", "min", "max", "count_all"; value_col
    None for count_all).  The INPUT should already be per-batch
    partial-combined where the aggregate allows it (sum-of-sums,
    min-of-mins, count = sum of partial counts: pass the partial count
    column with fn "sum").

    The coarse shuffle key hashes ``hash_cols`` (default: the FIRST key
    column — put the high-cardinality key first; a functionally-dependent
    second key, e.g. (l_orderkey, o_orderdate), rides along untouched).
    When no single key is high-cardinality, pass every key column so the
    buckets spread over the COMBINED cardinality instead of one column's
    few distinct values (e.g. a (nation, nation, year) rollup has 25
    distinct first-key values — 25 usable buckets — but 4200 distinct
    tuples).

    Returns one row per distinct key tuple: (*key_cols, *out_names)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hcols = hash_cols or [keys[0]]
    nc = num_coarse or _default_num_coarse()
    in_cols = keys + [c for c, _, _ in aggs if c is not None]
    arrow_aggs = [((c if c is not None else []), f) for c, f, _ in aggs]
    out_names = keys + [o for _, _, o in aggs]

    def tag(batch: pa.Table) -> pa.Table:
        coarse = _coarse_of(batch.column(hcols[0]), 1 << 62)
        for c in hcols[1:]:
            coarse = (coarse * _GOLDEN
                      + _coarse_of(batch.column(c), 1 << 62))
        return batch.append_column("__coarse",
                                   pa.array(coarse % nc, pa.int64()))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        g = group.select(in_cols).group_by(keys).aggregate(arrow_aggs)
        return g.rename_columns(out_names)

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(reduce_bucket, batch_format="pyarrow"))
