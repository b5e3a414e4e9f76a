"""The curation job surface: curate_corpus composition semantics on a
planted corpus, the generic partitioned writer's resume protocol, and one
CLI subprocess round-trip."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


@pytest.fixture()
def planted_docs(tmp_path):
    texts = [
        "The quick brown fox jumps over the lazy dog near the river bank",
        "The quick brown fox jumps over the lazy dog near the river bank",
        "mail me at bob@example.com about the Meeting Agenda For Tomorrow",
        "12345 67890 !!! ### 000",          # low quality (no alpha)
        "Completely distinct content about something else entirely here",
    ]
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["s0", "s0", "s1", "s1", "s2"], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    path = tmp_path / "documents.parquet"
    pq.write_table(docs, path)
    return str(path)


def test_curate_corpus_semantics(ray_session, planted_docs):
    from pdf_extract_kit_ray.functions.joins import sized_read_parquet
    from pdf_extract_kit_ray.pipelines.curation import curate_corpus
    docs = sized_read_parquet(planted_docs,
                              columns=["doc_id", "text", "lang", "source"])
    out = curate_corpus(docs, min_quality=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 13 quality-dropped; doc 11 is an exact dup of 10 -> keep 10
    assert out["doc_id"].tolist() == [10, 12, 14]
    redacted = out[out["doc_id"] == 12]["text"].iloc[0]
    assert "[EMAIL]" in redacted and "bob@example.com" not in redacted
    assert (out["n_tokens"] > 0).all() and (out["quality"] >= 0.5).all()


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.parametrize("data_format", [
    "parquet",
    "jsonl",
    pytest.param("lance", marks=pytest.mark.skipif(
        not _have_lance(), reason="no pylance wheel in this sandbox")),
])
def test_partitioned_table_writer_resume(ray_session, planted_docs, tmp_path,
                                         data_format):
    import shutil

    from pdf_extract_kit_ray.functions.joins import sized_read_parquet
    from pdf_extract_kit_ray.state.manifests import (
        completed_partitions, filter_completed_table, read_partitioned_table,
        rollup_table_metrics, write_partitioned_table)
    out_dir = str(tmp_path / "out")
    docs = sized_read_parquet(planted_docs,
                              columns=["doc_id", "text", "lang", "source"])
    m = write_partitioned_table(docs, out_dir, num_partitions=4,
                                data_format=data_format)
    metrics = rollup_table_metrics(m)
    assert metrics["rows"] == 5
    done = completed_partitions(out_dir)
    assert done == {int(p.split("=")[1]) for p in os.listdir(out_dir)}
    # round-trip: the format-detected reader returns every written row
    back = read_partitioned_table(out_dir).to_pandas()
    assert sorted(back["doc_id"].tolist()) == [10, 11, 12, 13, 14]

    # simulate a crash: drop one partition's manifest + data
    victim = sorted(done)[0]
    part_dir = os.path.join(out_dir, "part=%05d" % victim)

    def data_bytes(part):
        path = os.path.join(out_dir, part, f"data.{data_format}")
        if data_format in ("parquet", "jsonl"):
            return open(path, "rb").read()
        # lance partitions are datasets (version-stamped container bytes);
        # compare the LOGICAL rows via the shared IPC checksum instead
        import lance
        import zlib
        t = lance.dataset(path).to_table()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return zlib.crc32(sink.getvalue().to_pybytes())

    before = {p: data_bytes(p) for p in os.listdir(out_dir)}
    for f in os.listdir(part_dir):
        full = os.path.join(part_dir, f)
        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    remaining = filter_completed_table(docs, out_dir, 4)
    m2 = write_partitioned_table(remaining, out_dir, num_partitions=4,
                                 data_format=data_format)
    assert rollup_table_metrics(m2)["partitions"] == 1   # only the victim
    after = {p: data_bytes(p) for p in os.listdir(out_dir)}
    assert before == after                               # deterministic redo


def test_lance_write_import_gated(ray_session, planted_docs, tmp_path):
    """Without the pylance wheel the lance branch must fail AT SUBMIT with
    a clear ImportError (driver side, before any worker runs); bogus format
    names fail as ValueError regardless."""
    from pdf_extract_kit_ray.functions.joins import sized_read_parquet
    from pdf_extract_kit_ray.state.manifests import write_partitioned_table
    docs = sized_read_parquet(planted_docs, columns=["doc_id", "text"])
    with pytest.raises(ValueError, match="data_format"):
        write_partitioned_table(docs, str(tmp_path / "x"), data_format="orc")
    if not _have_lance():
        with pytest.raises(ImportError, match="pylance"):
            write_partitioned_table(docs, str(tmp_path / "y"),
                                    data_format="lance")


def test_curate_job_cli_roundtrip(tmp_path):
    out_dir = str(tmp_path / "curated")
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/curate_job.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out_dir, "--num-partitions", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["status"] == "ok"
    assert status["rows"] > 0 and status["partitions"] == 4
    files = [f for f in os.listdir(out_dir) if f.startswith("part=")]
    assert len(files) == 4
