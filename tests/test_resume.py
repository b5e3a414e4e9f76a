"""Checkpoint/resume: a run killed after K partitions must resume to a
byte-identical output with no duplicate doc_ids (SURVEY.md §5.2 item 4)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extract_kit_ray.pipelines.extract import ExtractConfig, extract_documents
from pdf_extract_kit_ray.sources.corpus import generate_corpus
from pdf_extract_kit_ray.state.manifests import (
    completed_partitions,
    filter_completed,
    rollup_metrics,
    write_partitioned,
)

N_PARTS = 8


def _run(raw_table, out_dir):
    ds = ray.data.from_arrow(raw_table).repartition(4)
    ds = filter_completed(ds, out_dir, N_PARTS)
    docs = extract_documents(ds, ExtractConfig.for_cpus(4))
    return write_partitioned(docs, out_dir, N_PARTS)


def _read_all(out_dir):
    rows = {}
    for f in sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))):
        for r in pq.read_table(f).to_pylist():
            assert r["doc_id"] not in rows, "duplicate doc_id across partitions"
            rows[r["doc_id"]] = r["spans"]
    return rows


def test_resume_is_idempotent_and_byte_identical(ray_session, tmp_path):
    raw, golden = generate_corpus(24, seed=3)
    full_dir = str(tmp_path / "full")
    resumed_dir = str(tmp_path / "resumed")

    # reference run: everything in one go
    manifests = _run(raw, full_dir).take_all()
    assert len(manifests) == len(completed_partitions(full_dir))

    # interrupted run: complete, then delete all but K partitions to simulate
    # a crash after K partitions committed
    _run(raw, resumed_dir).take_all()
    kept = 0
    for part in sorted(os.listdir(resumed_dir)):
        if kept < 3:
            kept += 1
            continue
        shutil.rmtree(os.path.join(resumed_dir, part))
    assert len(completed_partitions(resumed_dir)) == 3

    # resume: only incomplete partitions are re-run
    _run(raw, resumed_dir).take_all()
    assert len(completed_partitions(resumed_dir)) == len(manifests)

    a, b = _read_all(full_dir), _read_all(resumed_dir)
    assert a == b  # byte-identical content, no dup doc_ids

    # file bytes identical too (rows sorted by doc_id inside each partition)
    for f in sorted(glob.glob(os.path.join(full_dir, "part=*", "data.parquet"))):
        other = f.replace(full_dir, resumed_dir)
        assert open(f, "rb").read() == open(other, "rb").read()

    # manifests carry consistent lineage counts
    metrics = rollup_metrics(ray.data.from_items([
        json.load(open(p)) for p in
        glob.glob(os.path.join(resumed_dir, "part=*", "_MANIFEST.json"))]))
    assert metrics["n_docs"] == 24
    assert metrics["n_spans"] == sum(len(s) for s in a.values())
