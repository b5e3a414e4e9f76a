"""Content-defined chunking (pipelines/dedup.py): the vectorized
low-bits candidate trick pinned against the full 64-bit per-byte gear
recurrence, shift-robustness, size constraints, and the corpus rollups."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_kit_ray.pipelines.dedup import (_GEAR, cdc_boundaries,
                                                 cdc_chunk_stats,
                                                 cdc_dedup_stats)


def ref_boundaries(data: bytes, min_size=16, avg_bits=6, max_size=256):
    """Straight-line reference: full 64-bit gear recurrence per byte,
    then the same min/max walk."""
    h, cand = 0, []
    for i, b in enumerate(data):
        h = ((h << 1) + int(_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        if h & ((1 << avg_bits) - 1) == 0:
            cand.append(i + 1)
    cuts, last = [], 0
    for c in cand:
        while c - last > max_size:
            last += max_size
            cuts.append(last)
        if c - last >= min_size:
            cuts.append(c)
            last = c
    n = len(data)
    while n - last > max_size:
        last += max_size
        cuts.append(last)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts if data else []


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_matches_full_recurrence(seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    assert cdc_boundaries(data) == ref_boundaries(data)


def test_empty_and_tiny():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"abc") == [3]          # one whole-doc chunk


def test_size_constraints():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=8192, dtype=np.uint8).tobytes()
    cuts = cdc_boundaries(data, min_size=32, avg_bits=4, max_size=128)
    sizes = np.diff([0] + cuts)
    assert (sizes <= 128).all()
    assert (sizes[:-1] >= 32).all()               # tail chunk may be short


def test_shift_robustness():
    """Insert a prefix: chunk boundaries re-synchronize after at most one
    chunk — the property fixed-size chunking lacks."""
    rng = np.random.default_rng(11)
    body = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    orig = set(cdc_boundaries(body))
    shift = 17
    shifted = cdc_boundaries(rng.integers(
        0, 256, size=shift, dtype=np.uint8).tobytes() + body)
    resynced = {c - shift for c in shifted if c > shift + 256}
    # nearly all post-prefix boundaries line up with the originals
    assert len(resynced & orig) / max(len(resynced), 1) > 0.9


def test_chunk_stats_and_dedup_rollup(ray_session, tmp_path):
    shared = "x" * 600                             # forces shared chunks
    texts = [shared + " unique tail one", shared + " other tail",
             "completely different short doc", "", None]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    stats = {r["doc_id"]: r for r in
             cdc_chunk_stats(str(tmp_path)).take_all()}
    assert stats[0]["n_chunks"] >= 2               # 600 bytes > max_size
    assert stats[3]["n_chunks"] == 0
    assert stats[3]["avg_chunk_len"] is None
    assert stats[4]["n_chunks"] == 0
    got_avg = stats[2]["avg_chunk_len"]
    assert got_avg == round(len(texts[2].encode()) /
                            stats[2]["n_chunks"], 6)

    roll = cdc_dedup_stats(str(tmp_path)).take_all()[0]
    assert roll["total_chunks"] > roll["distinct_chunks"]
    assert roll["shared_chunks"] >= 1              # the shared prefix
    assert roll["dup_ratio"] == round(
        1 - roll["distinct_chunks"] / roll["total_chunks"], 6)


def test_dedup_rollup_empty_corpus(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    roll = cdc_dedup_stats(str(tmp_path)).take_all()[0]
    assert roll["total_chunks"] == 0 and roll["dup_ratio"] is None
