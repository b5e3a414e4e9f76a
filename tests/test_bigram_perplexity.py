"""bigram_perplexity edges the corpus cannot exercise: the
min_count-pruned smoothing-floor backoff, short/empty docs, and a
straight-line Python twin of the add-k model (pipelines/text.py)."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from pdf_extract_kit_ray.pipelines.text import bigram_perplexity


def _micro(x: float) -> int:
    # half away from zero, like Arrow's half_towards_infinity
    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


def ref_scores(texts, k=0.5, min_count=1):
    """Straight-line add-k bigram LM over the given corpus."""
    docs = [t.split() if t else [] for t in texts]
    bc, lc = {}, {}
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            lc[a] = lc.get(a, 0) + 1
    vocab = {w for p in bc for w in p}
    nv = len(vocab)
    out = {}
    for i, toks in enumerate(docs):
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        total = 0
        for a, b in pairs:
            c = bc[(a, b)]
            num = (c + k) if c >= min_count else k
            total += _micro(-math.log(num / (lc[a] + k * nv)))
        avg = total / (len(pairs) * 1e6)
        out[i] = (len(pairs), round(avg, 6), round(math.exp(avg), 6))
    return out


def _write_docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


CORPUS = [
    "the cat sat on the mat",
    "the cat ran on the mat",
    "the dog sat",
    "rare pair once only here",     # every bigram count 1
    "x",                            # 1 token -> omitted
    "",                             # empty -> omitted
    None,                           # null -> omitted
]


@pytest.mark.parametrize("min_count", [1, 2])
def test_matches_straight_line_twin(ray_session, tmp_path, min_count):
    sf = _write_docs(tmp_path, CORPUS)
    got = {r["doc_id"]: (r["n_pairs"], r["avg_neg_logprob"], r["ppl"])
           for r in bigram_perplexity(sf, min_count=min_count).take_all()}
    exp = ref_scores(CORPUS, min_count=min_count)
    assert got == exp
    assert 4 not in got and 5 not in got and 6 not in got


def test_pruning_raises_rare_doc_score(ray_session, tmp_path):
    """min_count=2 prunes every bigram of the rare doc to the smoothing
    floor, so its avg_neg_logprob strictly rises vs the exact model."""
    sf = _write_docs(tmp_path, CORPUS)
    exact = {r["doc_id"]: r["avg_neg_logprob"]
             for r in bigram_perplexity(sf, min_count=1).take_all()}
    pruned = {r["doc_id"]: r["avg_neg_logprob"]
              for r in bigram_perplexity(sf, min_count=2).take_all()}
    assert pruned[3] > exact[3]
    # "the cat"/"on the"/"the mat" (count 2) survive pruning untouched
    assert pruned[0] >= exact[0]


def test_all_short_docs_empty_result(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["solo", "", None])
    assert bigram_perplexity(sf).count() == 0
