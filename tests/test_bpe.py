"""BPE merge learning + encoding (pipelines/text.py) pinned against an
independent straight-line Sennrich reference and hand-checked merges."""

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_kit_ray.pipelines.text import bpe_encode, bpe_train

EOW = "</w>"


def ref_bpe(word_freq: dict, num_merges: int) -> list:
    """Textbook Sennrich BPE over a word-frequency dict (independent of
    the library implementation): max pair count, ties to the
    lexicographically smallest pair."""
    vocab = {tuple(w) + (EOW,): f for w, f in word_freq.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for seq, f in vocab.items():
            for p in zip(seq, seq[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(p for p, n in pairs.items()
                   if n == max(pairs.values()))
        merges.append((rank, best[0], best[1], pairs[best]))
        new = {}
        for seq, f in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def ref_encode(word: str, merges: list) -> int:
    ranks = {(m[1], m[2]): m[0] for m in merges}
    seq = list(word) + [EOW]
    while len(seq) > 1:
        cands = [(ranks[(a, b)], i) for i, (a, b)
                 in enumerate(zip(seq, seq[1:])) if (a, b) in ranks]
        if not cands:
            break
        _, i = min(cands)
        seq[i:i + 2] = [seq[i] + seq[i + 1]]
    return len(seq)


TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest",
    "widest new new low",
    "",
    None,
]


def _write(tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _word_freq():
    c = Counter()
    for t in TEXTS:
        c.update((t or "").split())
    return dict(c)


def test_merge_table_matches_reference(ray_session, tmp_path):
    sf = _write(tmp_path)
    got = [(r["rank"], r["left"], r["right"], r["pair_freq"])
           for r in bpe_train(sf, num_merges=12).take_all()]
    assert got == ref_bpe(_word_freq(), 12)
    # the classic first merges on this corpus: ('e','s') then ('es','t')
    # ('t','</w>') wins rank 0 (newest+widest+lowest share it)
    assert got[0][1:3] in {("e", "s"), ("s", "t"), ("t", EOW)}
    assert len(got) == 12


def test_merge_loop_exhausts_small_vocab(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ab ab"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    rows = bpe_train(str(tmp_path), num_merges=50).take_all()
    # 'ab</w>' fully merges in 2 steps; the loop stops when no pairs left
    assert len(rows) == 2


def test_encode_matches_reference(ray_session, tmp_path):
    sf = _write(tmp_path)
    merges = ref_bpe(_word_freq(), 8)
    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"],
                         r["pieces_per_tok"])
           for r in bpe_encode(sf, num_merges=8).take_all()}
    for i, t in enumerate(TEXTS):
        toks = (t or "").split()
        n_bpe = sum(ref_encode(w, merges) for w in toks)
        exp_ratio = (round(n_bpe / len(toks), 6) if toks else None)
        assert got[i] == (len(toks), n_bpe, exp_ratio), f"doc {i}"


def test_more_merges_never_increase_pieces(ray_session, tmp_path):
    sf = _write(tmp_path)
    few = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode(sf, num_merges=2).take_all()}
    many = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode(sf, num_merges=16).take_all()}
    assert all(many[d] <= few[d] for d in few)
