"""Per-partition checkpoint / lineage manifests and resumable output.

North-rule requirement: the 10^12-doc job must be resumable from checkpoint
with per-partition lineage + metrics.  Layout:

    out_dir/
      part=00017/data.parquet     # docs of partition 17, sorted by doc_id
      part=00017/_MANIFEST.json   # lineage: counts, checksum, partition spec

* ``partition_of(doc_id)`` is a deterministic content hash (crc32 % P) — the
  same doc lands in the same partition in every run, on every worker.
* A partition is COMPLETE iff its manifest exists; the data file is written
  to a temp name and renamed before the manifest, so a crash mid-partition
  leaves no manifest and the partition is redone idempotently.
* The doc checksum combines per-doc crc32s with XOR — commutative, so the
  partition checksum is independent of processing order.
* Resume = filter the input against the completed-partition set (broadcast
  once), re-run only incomplete partitions; output is byte-identical because
  per-partition files are sorted by doc_id.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import List, Set

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..schemas import DOC_SCHEMA

MANIFEST_NAME = "_MANIFEST.json"

MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("n_docs", pa.int64()),
    ("n_spans", pa.int64()),
    ("checksum", pa.int64()),
    ("path", pa.string()),
    ("elapsed_ms", pa.int64()),      # per-partition write wall time
])


def partition_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def _doc_checksum(doc_id: str, spans: List[dict]) -> int:
    h = zlib.crc32(doc_id.encode("utf-8"))
    for s in spans:
        h = zlib.crc32(
            ("%s\x00%s\x00%s\x00%d" % (s["kind"], s["text"], s["media_ref"],
                                       s["offset"])).encode("utf-8"), h)
    return h


def _chaos_exit_after(out_dir: str) -> None:
    """Fault-injection drill hook — inert unless the env var
    ``PEK_FAULT_EXIT_AFTER_PARTS=K`` is set (workers of a local cluster
    inherit the submitting process's environment).  Once >= K partitions
    have a committed manifest, the next ``PEK_FAULT_MAX`` (default 3)
    writing workers hard-exit (``os._exit``, no Python cleanup) — the
    closest single-node stand-in for losing nodes mid-sink.  Each crash
    claims one ``.fault.N`` marker file with O_EXCL so exactly MAX
    workers die cluster-wide; Ray's task retry then reruns the lost
    partitions on fresh workers and the job must COMPLETE with output
    byte-identical to an unfaulted run (tests/test_fault_drill.py) —
    the manifest-last + tmp-rename protocol is what makes the retry
    idempotent."""
    k = os.environ.get("PEK_FAULT_EXIT_AFTER_PARTS")
    if k is None or len(completed_partitions(out_dir)) < int(k):
        return
    for i in range(int(os.environ.get("PEK_FAULT_MAX", "3"))):
        try:
            fd = os.open(os.path.join(out_dir, ".fault.%d" % i),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        os.close(fd)
        os._exit(9)


def completed_partitions(out_dir: str) -> Set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part=") and \
                os.path.exists(os.path.join(out_dir, name, MANIFEST_NAME)):
            done.add(int(name.split("=")[1]))
    return done


def filter_completed(ds: "ray.data.Dataset", out_dir: str,
                     num_partitions: int) -> "ray.data.Dataset":
    """Drop docs whose output partition is already complete (the resume
    anti-join; the completed set is broadcast in the task closure)."""
    done = completed_partitions(out_dir)
    if not done:
        return ds

    def keep(batch: pa.Table) -> pa.Table:
        mask = [partition_of(d, num_partitions) not in done
                for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))
    return ds.map_batches(keep, batch_format="pyarrow")


def write_partitioned(docs: "ray.data.Dataset", out_dir: str,
                      num_partitions: int = 32) -> "ray.data.Dataset":
    """Write extracted docs as resumable partitioned parquet; returns the
    manifest Dataset (one small row per partition).

    Implemented as groupby(partition_id).map_groups so each partition is
    written exactly once by one task (atomic rename + manifest-last); the
    manifest rows double as the lineage/metrics roll-up."""
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        pids = pa.array([partition_of(d, num_partitions)
                         for d in batch.column("doc_id").to_pylist()],
                        pa.int32())
        return batch.append_column("partition_id", pids)

    def write_group(group: pa.Table) -> pa.Table:
        import time
        _chaos_exit_after(out_dir)
        t0 = time.monotonic()
        pid = group.column("partition_id")[0].as_py()
        group = group.sort_by("doc_id").drop_columns(["partition_id"])
        group = group.cast(DOC_SCHEMA)
        part_dir = os.path.join(out_dir, "part=%05d" % pid)
        os.makedirs(part_dir, exist_ok=True)
        data_path = os.path.join(part_dir, "data.parquet")
        tmp_path = data_path + ".tmp"
        pq.write_table(group, tmp_path)
        os.replace(tmp_path, data_path)
        checksum = 0
        n_spans = 0
        for row in group.to_pylist():
            checksum ^= _doc_checksum(row["doc_id"], row["spans"])
            n_spans += len(row["spans"])
        manifest = {"partition_id": pid, "n_docs": len(group),
                    "n_spans": n_spans, "checksum": checksum,
                    "path": data_path,
                    "elapsed_ms": int((time.monotonic() - t0) * 1000)}
        # manifest commit mirrors the data-file protocol (tmp + atomic
        # rename): manifest EXISTENCE means COMPLETE, so a crash mid-write
        # must not leave a truncated _MANIFEST.json behind
        manifest_path = os.path.join(part_dir, MANIFEST_NAME)
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(manifest_path + ".tmp", manifest_path)
        return pa.Table.from_pylist([manifest], schema=MANIFEST_SCHEMA)

    return (docs.map_batches(tag, batch_format="pyarrow")
                .groupby("partition_id")
                .map_groups(write_group, batch_format="pyarrow"))


def rollup_metrics(manifests: "ray.data.Dataset") -> dict:
    """Tiny global lineage roll-up from the per-partition manifest rows."""
    rows = manifests.take_all()
    return {
        "n_partitions": len(rows),
        "n_docs": sum(r["n_docs"] for r in rows),
        "n_spans": sum(r["n_spans"] for r in rows),
        "checksum": _xor_all(r["checksum"] for r in rows),
    }


def _xor_all(values) -> int:
    acc = 0
    for v in values:
        acc ^= v
    return acc


# ---------------------------------------------------------------------------
# generic (schema-agnostic) resumable partitioned writer
# ---------------------------------------------------------------------------

TABLE_MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("n_rows", pa.int64()),
    ("checksum", pa.int64()),
    ("path", pa.string()),
    ("elapsed_ms", pa.int64()),
])


def _require_lance():
    """Import gate shared with the read side (pipelines/extract.read_corpus):
    Lance is the named production format (BASELINE.json north rule) but the
    sandbox ships no wheel, so the format is config-selectable and fails
    loudly at SUBMIT time (driver side), never mid-corpus in a worker."""
    try:
        import lance
    except ImportError:
        raise ImportError(
            "data_format='lance' needs the pylance wheel (`pip install "
            "pylance`); not installed in this sandbox — use the default "
            "data_format='parquet'")
    return lance


def write_partitioned_table(ds: "ray.data.Dataset", out_dir: str,
                            num_partitions: int = 32,
                            key_col: str = "doc_id",
                            data_format: str = "parquet") -> "ray.data.Dataset":
    """The extraction sink's checkpoint/lineage protocol for ANY flat
    table (the curation-job sink): partition by crc32 of the key column's
    decimal string, one atomic data file + manifest-last commit per
    partition, manifest rows as the lineage roll-up.

    The partition checksum is crc32 of the partition's Arrow IPC bytes
    AFTER an in-partition sort by ``key_col`` — deterministic across runs,
    workers, and block layouts without any per-row Python, and IDENTICAL
    across ``data_format`` choices (the checksum hashes the logical rows,
    not the container bytes), so a parquet run and a lance run of the same
    input roll up to the same lineage.

    ``data_format``: ``"parquet"`` (default; atomic tmp-file + rename),
    ``"lance"`` (one Lance dataset per partition, ``mode="overwrite"`` so a
    crashed partial write is replaced idempotently on resume — the
    manifest-last commit still decides completeness either way), or
    ``"jsonl"`` (atomic tmp + rename; the interchange format training
    corpora commonly move as — pandas' C serializer, deterministic
    bytes)."""

    if data_format not in ("parquet", "lance", "jsonl"):
        raise ValueError(f"data_format must be 'parquet', 'lance' or "
                         f"'jsonl', got {data_format!r}")
    if data_format == "lance":
        _require_lance()                     # fail at submit, not in workers
    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        pids = pa.array([partition_of(str(k), num_partitions)
                         for k in batch.column(key_col).to_pylist()],
                        pa.int32())
        return batch.append_column("partition_id", pids)

    def write_group(group: pa.Table) -> pa.Table:
        import time
        _chaos_exit_after(out_dir)
        t0 = time.monotonic()
        pid = group.column("partition_id")[0].as_py()
        group = group.sort_by(key_col).drop_columns(["partition_id"])
        part_dir = os.path.join(out_dir, "part=%05d" % pid)
        os.makedirs(part_dir, exist_ok=True)
        if data_format == "lance":
            lance = _require_lance()
            data_path = os.path.join(part_dir, "data.lance")
            lance.write_dataset(group, data_path, mode="overwrite")
        elif data_format == "jsonl":
            data_path = os.path.join(part_dir, "data.jsonl")
            tmp_path = data_path + ".tmp"
            group.to_pandas().to_json(tmp_path, orient="records",
                                      lines=True, force_ascii=False)
            os.replace(tmp_path, data_path)
        else:
            data_path = os.path.join(part_dir, "data.parquet")
            tmp_path = data_path + ".tmp"
            pq.write_table(group, tmp_path)
            os.replace(tmp_path, data_path)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, group.schema) as w:
            w.write_table(group)
        checksum = zlib.crc32(sink.getvalue().to_pybytes())
        manifest = {"partition_id": pid, "n_rows": group.num_rows,
                    "checksum": checksum, "path": data_path,
                    "elapsed_ms": int((time.monotonic() - t0) * 1000)}
        manifest_path = os.path.join(part_dir, MANIFEST_NAME)
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(manifest_path + ".tmp", manifest_path)
        return pa.Table.from_pylist([manifest],
                                    schema=TABLE_MANIFEST_SCHEMA)

    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("partition_id")
              .map_groups(write_group, batch_format="pyarrow"))


def filter_completed_table(ds: "ray.data.Dataset", out_dir: str,
                           num_partitions: int,
                           key_col: str = "doc_id") -> "ray.data.Dataset":
    """Resume anti-join for the generic writer (string-keyed partition_of
    over the key column)."""
    done = completed_partitions(out_dir)
    if not done:
        return ds

    def keep(batch: pa.Table) -> pa.Table:
        mask = [partition_of(str(k), num_partitions) not in done
                for k in batch.column(key_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def rollup_table_metrics(manifests: "ray.data.Dataset") -> dict:
    rows = manifests.take_all()
    return {
        "partitions": len(rows),
        "rows": int(sum(r["n_rows"] for r in rows)),
        "checksum": _xor_all(r["checksum"] for r in rows),
    }


def read_partitioned_table(out_dir: str) -> "ray.data.Dataset":
    """Read a ``write_partitioned_table`` output back as one Dataset,
    format-detected from the COMPLETED partitions' manifests (incomplete
    partitions — data without a manifest — are skipped, matching the
    resume protocol's completeness rule).  Parquet parts read as one
    multi-file ``read_parquet`` (per-file blocks, streaming); lance parts
    are independent datasets, read and unioned lazily."""
    paths = []
    for part in sorted(os.listdir(out_dir)):
        mpath = os.path.join(out_dir, part, MANIFEST_NAME)
        if part.startswith("part=") and os.path.exists(mpath):
            with open(mpath) as f:
                paths.append(json.load(f)["path"])
    if not paths:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    if paths[0].endswith(".lance"):
        _require_lance()
        parts = [ray.data.read_lance(p) for p in paths]
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if paths[0].endswith(".jsonl"):
        return ray.data.read_json(paths)
    return ray.data.read_parquet(paths)
