"""Mid-run fault-injection drill (the 100x-cluster property the other
suites never exercise): SIGKILL a model-stage actor and a task worker
while the flagship extraction is in flight and assert the run still
completes with golden-equal spans (Ray actor restart / task retry); then
hard-crash the curation sink's workers mid-write (the
PEK_FAULT_EXIT_AFTER_PARTS chaos hook) and assert the failed run leaves a
manifest-consistent partial output that a --resume run completes
BYTE-identically vs an uninterrupted run.

Victim discovery scans /proc for `ray::<stage>` process titles — the
state API needs the dashboard, which the test cluster disables.
"""

import glob
import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_extract_kit_ray.pipelines.extract import (ExtractConfig,
                                                   extract_documents)
from pdf_extract_kit_ray.sources.corpus import generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ray_worker_pids(substr: str):
    """PIDs of live local Ray workers whose process title contains
    ``substr`` (Ray retitles workers `ray::<task or actor>`)."""
    out = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            cmd = open(p, "rb").read().replace(b"\0", b" ") \
                .decode("utf-8", "replace")
        except OSError:
            continue
        if cmd.startswith("ray::") and substr in cmd:
            out.append(int(p.split("/")[2]))
    return out


def _run_with_kill(cfg, victim_substr, n_docs=48, seed=7):
    """Start the flagship on a burn-padded corpus, SIGKILL the first
    matching worker mid-run, return (result_df, golden, killed_pids)."""
    raw, golden = generate_corpus(n_docs, seed=seed)
    ds = ray.data.from_arrow(raw).repartition(8)
    result = {}

    def run():
        result["df"] = extract_documents(ds, cfg).to_pandas()

    t = threading.Thread(target=run)
    t.start()
    killed = []
    deadline = time.time() + 30
    while not killed and t.is_alive() and time.time() < deadline:
        time.sleep(0.15)
        for pid in _ray_worker_pids(victim_substr):
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                continue
            killed.append(pid)
            break
    t.join(timeout=180)
    assert not t.is_alive(), "extraction never finished after the kill"
    return result.get("df"), golden, killed


def _assert_golden(df, golden):
    assert df is not None
    expected = {r["doc_id"]: r["spans"] for r in golden.to_pylist()}
    got = {r.doc_id: [dict(kind=s["kind"], text=s["text"],
                           media_ref=s["media_ref"], offset=s["offset"])
                      for s in r.spans] for r in df.itertuples()}
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == [dict(kind=s["kind"], text=s["text"],
                               media_ref=s["media_ref"], offset=s["offset"])
                          for s in expected[d]], d


def test_actor_pool_kill_recovers_golden(ray_session):
    """SIGKILL one FusedExtractStage actor mid-run: the pool must replace
    it (Ray Data actors restart) and the output must stay span-golden."""
    cfg = ExtractConfig.for_cpus(4, stage_mode="fused_actors",
                                 emulate_inference_ms=15.0)
    cfg.fused_concurrency = 3
    df, golden, killed = _run_with_kill(cfg, "FusedExtractStage")
    assert killed, "no model-stage actor observed to kill — burn too short"
    _assert_golden(df, golden)


def test_task_worker_kill_recovers_golden(ray_session):
    """SIGKILL a stateless task worker mid-run: Ray's task retry must
    rerun the lost blocks; output stays span-golden."""
    cfg = ExtractConfig.for_cpus(4, stage_mode="fused_tasks",
                                 emulate_inference_ms=15.0)
    df, golden, killed = _run_with_kill(cfg, "fused_extract_batch")
    assert killed, "no task worker observed to kill — burn too short"
    _assert_golden(df, golden)


# ------------------------------------------------------ writer chaos


def _planted_documents(path: str, n: int = 400):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa", "sigma", "omega"]
    texts = [" ".join(words[(i + j) % len(words)]
                      for j in range(12 + i % 9)) + "."
             for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s%d" % (i % 4) for i in range(n)],
                           pa.string()),
    })
    pq.write_table(t, path)


def _curate(inp, out, env_extra=None, resume=False):
    env = dict(os.environ, RAY_ADDRESS="local",
               RAY_DEDUP_LOGS="0", **(env_extra or {}))
    env.pop("PEK_FAULT_EXIT_AFTER_PARTS", None)
    if env_extra:
        env.update(env_extra)
    cmd = [sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
           "--input", inp, "--output", out, "--num-partitions", "16"]
    if resume:
        cmd.append("--resume")
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=600)


def _partition_state(out_dir):
    state = {}
    for part in sorted(glob.glob(os.path.join(out_dir, "part=*"))):
        mf = os.path.join(part, "_MANIFEST.json")
        if not os.path.exists(mf):
            continue
        man = json.load(open(mf))
        h = hashlib.sha256(
            open(os.path.join(part, "data.parquet"), "rb").read()
        ).hexdigest()
        state[os.path.basename(part)] = (
            man["n_rows"], man["checksum"], h)
    return state


def test_writer_survives_midwrite_crashes_byte_identical(ray_session,
                                                         tmp_path):
    """Three writer workers hard-exit (os._exit) mid-sink once >= 2
    partitions have committed; Ray task retry reruns the lost partitions
    and the manifest-last protocol keeps the retries idempotent — the
    completed output must be byte-identical to an unfaulted run."""
    inp = str(tmp_path / "documents.parquet")
    _planted_documents(inp)
    crashed = str(tmp_path / "crashed")
    clean = str(tmp_path / "clean")

    r1 = _curate(inp, crashed,
                 env_extra={"PEK_FAULT_EXIT_AFTER_PARTS": "2",
                            "PEK_FAULT_MAX": "3"})
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    # the drill actually fired: all three crash markers were claimed
    assert len(glob.glob(os.path.join(crashed, ".fault.*"))) == 3
    # atomic protocol: no stray tmp files next to committed data
    assert not glob.glob(os.path.join(crashed, "part=*", "*.tmp"))

    r2 = _curate(inp, clean)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    faulted = _partition_state(crashed)
    fresh = _partition_state(clean)
    assert len(faulted) == 16
    assert faulted == fresh


def test_writer_kill_then_resume_byte_identical(ray_session, tmp_path):
    """Crash-then-resume on the TABLE writer: run the chaos job, then
    simulate the operator restarting it with --resume after deleting the
    evidence of two partitions (a crash that lost those commits); the
    resumed directory must match the clean run byte-for-byte and the
    resume run must actually skip the completed partitions."""
    import shutil
    inp = str(tmp_path / "documents.parquet")
    _planted_documents(inp)
    out = str(tmp_path / "out")
    clean = str(tmp_path / "clean2")
    r1 = _curate(inp, out)
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    parts = sorted(glob.glob(os.path.join(out, "part=*")))
    for p in parts[:2]:
        shutil.rmtree(p)
    r2 = _curate(inp, out, resume=True)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    line = [l for l in r2.stdout.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["skipped_partitions"] == 14
    r3 = _curate(inp, clean)
    assert r3.returncode == 0
    assert _partition_state(out) == _partition_state(clean)
    assert len(_partition_state(out)) == 16
