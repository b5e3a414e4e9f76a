"""Reusable broadcast-join primitive.

The 100 TB join decision rule (SURVEY.md §4 / ray_guide shuffle notes):

* **both sides large** -> hash-shuffle ``Dataset.join`` (see
  relational.order_priority_revenue, partition count ~CPUs/4);
* **one side small** (dimension table, query matrix, band edges) ->
  broadcast it ONCE via ``ray.put`` and join inside every ``map_batches``
  task — no shuffle at all, cost O(corpus) map + O(|small|) per worker.

Round 1 rebuilt the broadcast-lookup shape ad hoc per query
(orders_per_nation, events_value_bands, ann_topk); this module is the shared
primitive so the pattern cannot drift.

Implementation note: a naive per-batch ``pa.Table.join`` re-builds the
right side's hash table for EVERY batch (measured 2x slower than round 1's
hand-rolled lookup at sf0.1).  Instead the right side is indexed ONCE PER
WORKER PROCESS (sorted-key + np.searchsorted, cached keyed by object ref),
and each batch is a vectorized probe — tasks reuse warm workers, so the
build cost amortizes exactly like actor state without reserving an actor
pool.  Multi-key joins fall back to the Arrow kernel.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

_JOIN_TYPES = {"inner", "left outer", "left semi", "left anti"}

# per-worker-process index cache: ObjectRef hex -> built index (bounded)
_INDEX_CACHE: "OrderedDict[str, tuple]" = OrderedDict()
_INDEX_CACHE_MAX = 4


def _build_index(right: pa.Table, key: str) -> tuple:
    """Index the right table by its (unique) key.  Dense integer keys get a
    direct position array (O(1) probes, like a dictionary-encode); anything
    else a sorted array probed with searchsorted."""
    keys = right.column(key).to_numpy()
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    if len(sorted_keys) > 1 and (sorted_keys[1:] == sorted_keys[:-1]).any():
        raise ValueError(
            f"broadcast_join fast path requires unique keys in the small "
            f"side (duplicate {key!r} values found); pre-aggregate the "
            f"small side or join on a unique key")
    right_sorted = right.take(order)
    if len(sorted_keys) and np.issubdtype(sorted_keys.dtype, np.integer):
        kmin, kmax = int(sorted_keys[0]), int(sorted_keys[-1])
        span = kmax - kmin + 1
        if span <= max(4 * len(sorted_keys), 1024):
            pos_of = np.full(span, -1, dtype=np.int64)
            pos_of[sorted_keys - kmin] = np.arange(len(sorted_keys))
            return ("dense", kmin, pos_of, right_sorted)
    return ("sorted", sorted_keys, right_sorted)


def _probe_index(idx: tuple, k: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(found_mask, position_in_right_sorted) for a batch of probe keys."""
    if idx[0] == "dense":
        _, kmin, pos_of, _ = idx
        offs = k - kmin
        valid = (offs >= 0) & (offs < len(pos_of))
        pos = np.where(valid, pos_of[np.minimum(np.maximum(offs, 0),
                                                len(pos_of) - 1)], -1)
        return pos >= 0, np.maximum(pos, 0)
    _, sorted_keys, _ = idx
    if not len(sorted_keys):
        return np.zeros(len(k), dtype=bool), np.zeros(len(k), dtype=np.int64)
    pos = np.searchsorted(sorted_keys, k)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    return (pos < len(sorted_keys)) & (sorted_keys[pos_c] == k), pos_c


def _worker_index(ref, key: str):
    ck = ref.hex() + "/" + key
    idx = _INDEX_CACHE.get(ck)
    if idx is None:
        idx = _build_index(ray.get(ref), key)
        _INDEX_CACHE[ck] = idx
        while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
            _INDEX_CACHE.popitem(last=False)
    return idx


def broadcast_join(ds: "ray.data.Dataset", small: pa.Table,
                   on: Union[str, Sequence[str]],
                   right_on: Union[str, Sequence[str], None] = None,
                   join_type: str = "inner",
                   select: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Join a Dataset against a SMALL in-memory Arrow table without a
    shuffle: the table ships to the object store once; every task probes a
    per-worker cached sorted index of it (single-key fast path) or uses the
    Arrow hash-join kernel (multi-key).

    Only left-preserving join types make sense here (the right side is
    replicated): inner / left outer / left semi / left anti.  The single-key
    fast path requires unique keys on the small side (dimension-table
    semantics).  Row order within a batch is not guaranteed — compose with
    aggregations or sorts, not positional logic.
    """
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {sorted(_JOIN_TYPES)}; "
                         f"for two large sides use Dataset.join")
    keys = [on] if isinstance(on, str) else list(on)
    right_keys = ([right_on] if isinstance(right_on, str)
                  else list(right_on) if right_on is not None else keys)
    small_ref = ray.put(small)

    if len(keys) > 1:
        def do_join(batch: pa.Table) -> pa.Table:
            right = ray.get(small_ref)
            out = batch.join(right, keys=keys, right_keys=right_keys,
                             join_type=join_type)
            return out.select(select) if select is not None else out
        return ds.map_batches(do_join, batch_format="pyarrow")

    left_key, right_key = keys[0], right_keys[0]

    def probe(batch: pa.Table) -> pa.Table:
        idx = _worker_index(small_ref, right_key)
        right_sorted = idx[-1]
        found, pos_c = _probe_index(idx, batch.column(left_key).to_numpy())
        if join_type == "left semi":
            out = batch.filter(pa.array(found))
        elif join_type == "left anti":
            out = batch.filter(pa.array(~found))
        elif join_type == "inner":
            out = batch.filter(pa.array(found))
            matched = right_sorted.take(pa.array(pos_c[found], pa.int64()))
            for name in matched.column_names:
                if name == right_key:
                    continue
                out = out.append_column(name, matched.column(name))
        else:  # left outer: null right columns where unmatched
            out = batch
            take_idx = pa.array(np.where(found, pos_c, 0), pa.int64(),
                                mask=~found)
            matched = right_sorted.take(take_idx)
            for name in matched.column_names:
                if name == right_key:
                    continue
                out = out.append_column(name, matched.column(name))
        return out.select(select) if select is not None else out

    return ds.map_batches(probe, batch_format="pyarrow")


def dataset_to_table(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL (bounded-by-contract) dataset into one Arrow
    table, PRESERVING the schema when the result is empty.
    ``Dataset.to_pandas()`` drops all columns on an empty result (the
    documented Ray quirk), which turns a downstream ``broadcast_join``
    into a KeyError on the join key; Arrow block refs keep their schema
    even at zero rows."""
    tables = [t for t in ray.get(ds.to_arrow_refs())]
    if not tables:
        schema = ds.schema()
        if schema is None or not schema.names:
            return pa.table({})
        return pa.schema(list(zip(schema.names, schema.types))) \
            .empty_table()
    return pa.concat_tables(tables, promote_options="default")


def pin_schema(seed: pa.Table, ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union a ZERO-ROW typed seed table in front of ``ds`` so the
    pipeline keeps its schema even when the result is legitimately
    empty (Ray drops the schema entirely on empty aggregates/sorts).
    The seed must match the dataset's output schema field-for-field.
    Quirk: when ``ds`` ends in a Limit operator, interpose an identity
    ``map_batches`` first — Ray's planner asserts on a union whose
    direct child is a Limit."""
    return ray.data.from_arrow(seed).union(ds)


def make_lookup(keys, values) -> tuple:
    """Package a small key->value mapping for broadcast (``ray.put`` the
    result once, probe with :func:`lookup_np` in every task).  Keys become
    an Arrow array (hash-probed via ``pc.index_in`` — Arrow-native, no
    Python-dict hashing per element); values a numpy array.  Pass Arrow
    columns directly when available — that preserves the key type even for
    empty mappings (``pa.array([])`` would be null-typed)."""
    if isinstance(keys, pa.ChunkedArray):
        key_arr = keys.combine_chunks()
    elif isinstance(keys, pa.Array):
        key_arr = keys
    else:
        key_arr = pa.array(list(keys))
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        vals = values.to_numpy(zero_copy_only=False)
    else:
        vals = np.asarray(list(values))
    return (key_arr, vals)


def lookup_np(batch_keys: "pa.Array | pa.ChunkedArray", table: tuple,
              default=None) -> np.ndarray:
    """Vectorized broadcast-dictionary probe: maps an Arrow key column to
    the packaged values via ``pc.index_in`` + numpy take.  The Arrow-native
    replacement for ``pd.Series.map(dict)`` in hot maps (hash probe runs in
    the Arrow kernel, gather in numpy — no per-element Python).

    ``default`` fills missing keys; with ``default=None`` every key MUST be
    present (raises ``KeyError`` otherwise) — use that for joins that are
    total by construction so a contract break fails loudly."""
    import pyarrow.compute as _pc
    key_arr, vals = table
    idx = _pc.index_in(batch_keys, value_set=key_arr)
    pos = _pc.fill_null(idx, -1).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    missing = pos < 0
    if default is None:
        if missing.any():
            bad = batch_keys.to_pylist()[int(np.flatnonzero(missing)[0])] \
                if len(batch_keys) else None
            raise KeyError(f"lookup_np: key {bad!r} absent from the "
                           "broadcast table and no default given")
        return vals[pos]
    if len(vals) == 0:
        return np.full(len(pos), default)
    out = vals[np.maximum(pos, 0)]
    if missing.any():
        out = np.where(missing, np.asarray(default, dtype=out.dtype), out)
    return out


# sides whose PRUNED columns fit under this take the broadcast path (one
# object-store ship + per-worker cached index) instead of a hash-shuffle
# Dataset.join; past it the pruned side no longer fits every worker's heap
BROADCAST_BYTES = 128 << 20


def broadcast_range_join(ds: "ray.data.Dataset", intervals: pa.Table,
                         on: str, start_col: str,
                         end_col: str) -> "ray.data.Dataset":
    """INNER interval join: keep each fact row once per interval whose
    [start, end] (inclusive) contains ``row[on]``, appending ALL interval
    columns to the emitted row — the range-join primitive Ray Data lacks
    (the fact x small-dimension shape: calendar windows, price bands,
    IP ranges).

    Partitioning contract: the interval table is the SMALL side — it
    ships once via ``ray.put`` and every batch probes it with one
    vectorized mask per interval (intervals may overlap; a row matching
    m intervals emits m times).  Cost is O(k · batch) — fine for the
    broadcast-dimension regime this implements; for k beyond ~10^3
    non-overlapping SORTED intervals, switch the probe to a single
    searchsorted over the boundary array instead.

    NULL ``on`` values match nothing (SQL BETWEEN semantics)."""
    schema = ds.schema()
    # a fully-empty upstream loses its schema (Ray quirk) — nothing to
    # collide with, and the probe only ever appends to non-empty batches
    if schema is not None:
        overlap = set(intervals.column_names) & set(schema.names)
        if overlap:
            raise ValueError(f"interval columns collide with fact "
                             f"columns: {sorted(overlap)}")
    ref = ray.put(intervals)
    import pyarrow.compute as _pc

    def probe(batch: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        empty = batch.slice(0, 0)
        for c in iv.column_names:
            empty = empty.append_column(c, iv.column(c).slice(0, 0))
        outs = [empty]
        vals = batch.column(on)
        for i in range(iv.num_rows):
            mask = _pc.and_kleene(
                _pc.greater_equal(vals, iv.column(start_col)[i]),
                _pc.less_equal(vals, iv.column(end_col)[i]))
            sub = batch.filter(_pc.fill_null(mask, False))
            if sub.num_rows == 0:
                continue
            idx = pa.array(np.full(sub.num_rows, i, dtype=np.int64))
            for c in iv.column_names:       # type-preserving constant fill
                sub = sub.append_column(c, _pc.take(iv.column(c), idx))
            outs.append(sub)
        return pa.concat_tables(outs)

    return ds.map_batches(probe, batch_format="pyarrow")


def join_partitions(num_partitions: "int | None" = None) -> int:
    """Hash-join partition count: ~CPUs/4, min 8.  Each partition is a
    long-lived aggregator ACTOR; more partitions than ~CPUs/4
    oversubscribes a node (measured at 32 CPUs, sf0.1: 8 parts ≈ 3.9 s,
    32 parts ≈ 8-16 s, 64 parts ≈ 10-40 s).  On a multi-node cluster the
    same rule spreads the aggregators across nodes; per-partition data
    volume, not count, is the scale knob."""
    if num_partitions is not None:
        return num_partitions
    cpus = 32
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 32))
    return max(8, cpus // 4)


def sized_join(left: "ray.data.Dataset", right_path: str,
               right_cols: List[str], *, on: str, right_on: str,
               join_type: str = "inner",
               num_partitions: "int | None" = None,
               broadcast_bytes: int = BROADCAST_BYTES) -> "ray.data.Dataset":
    """THE size-based join rule, as one named plan-time decision: if the
    right side's PRUNED columns (metadata-estimated, no data read) fit
    under ``broadcast_bytes``, broadcast-join it (no shuffle); otherwise
    fall back to the partitioned hash-shuffle ``Dataset.join`` — the
    100 TB shape where the right side is itself a fact table.

    Queries whose right side needs a pre-join transform (filter,
    semi-join) per branch keep the rule inline (q3_shipping_priority);
    everything with a plain pruned right side goes through here so the
    threshold and fallback shape cannot drift between queries."""
    if pruned_parquet_bytes(right_path, right_cols) <= broadcast_bytes:
        return broadcast_join(left,
                              read_small_table(right_path,
                                               columns=right_cols),
                              on=on, right_on=right_on, join_type=join_type)
    right = sized_read_parquet(right_path, columns=right_cols)
    return left.join(right, join_type=join_type,
                     num_partitions=join_partitions(num_partitions),
                     on=(on,), right_on=(right_on,))


def read_small_table(path: str, columns: Optional[List[str]] = None,
                     filter=None) -> pa.Table:
    """Load a dimension table for broadcasting (pruned columns + optional
    pushed-down row filter)."""
    import pyarrow.dataset as pads
    return pads.dataset(path).to_table(columns=columns, filter=filter)


def sized_read_parquet(path: str, columns: Optional[List[str]] = None,
                       target_block_bytes: int = 32 << 20):
    """Parquet read with SHUFFLE-AWARE block sizing.

    Ray's default read splits small files into ~64 blocks regardless of
    size, and every downstream sort/groupby inherits that as its partition
    count — each partition carrying ~50-100 ms of fixed scheduling cost,
    which dominates when per-partition data is kilobytes (measured:
    minhash_dedup at sf0.1 went 4.8 s with 64 blocks -> 1.15 s with 8,
    identical output).  Blocks here scale with DATA — one per
    ``target_block_bytes`` of uncompressed pruned bytes — with a floor of
    cpus/4 so map stages keep some parallelism; at 100 TB the byte term
    dominates and the count grows naturally."""
    import ray.data
    total = pruned_parquet_bytes(path, columns) if columns else \
        pruned_parquet_bytes(path, _all_columns(path))
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=target_num_blocks(total, target_block_bytes))


def target_num_blocks(total_bytes: int,
                      target_block_bytes: int = 32 << 20) -> int:
    """THE block-count policy: one block per ``target_block_bytes`` of
    uncompressed data, floor cpus/4 for map parallelism, floor 1 because
    ``override_num_blocks=0`` is rejected (and cpus//4 is 0 on a 2-3 CPU
    cluster).  Shared by ``sized_read_parquet`` and any mid-pipeline
    re-blocking (e.g. the media LSH feature table) so the sizing rule
    cannot drift."""
    import ray
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return int(max(1, cpus // 4, total_bytes // target_block_bytes))


def _all_columns(path: str) -> List[str]:
    import pyarrow.dataset as pads
    return [f.name for f in pads.dataset(path).schema]


def pruned_parquet_bytes(path: str, columns: List[str]) -> int:
    """Uncompressed byte size of the given columns, from parquet metadata
    only (no data read) — the estimator behind the broadcast-vs-hash-join
    decision rule."""
    import pyarrow.dataset as pads
    total = 0
    for frag in pads.dataset(path).get_fragments():
        md = frag.metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema.split(".")[0] in columns:
                    total += col.total_uncompressed_size
    return total
