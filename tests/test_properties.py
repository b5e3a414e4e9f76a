"""Property-based invariants (hypothesis) for geometry, NMS and sketches."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extract_kit_ray.functions.geometry import (iou, merge_intervals,
                                                    nms_bboxes)
from pdf_extract_kit_ray.functions.sketches import DDSketch, HLL, splitmix64

boxes_st = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 200),
              st.integers(1, 60), st.integers(1, 60)).map(
        lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]]),
    min_size=0, max_size=12)


@given(boxes_st, st.floats(0.1, 0.9))
@settings(max_examples=150, deadline=None)
def test_nms_invariants(boxes, thr):
    scores = [round(0.99 - 0.01 * i, 2) for i in range(len(boxes))]
    kept = nms_bboxes(boxes, scores, thr)
    # kept set is pairwise non-overlapping above the threshold
    for i, a in enumerate(kept):
        for b in kept[i + 1:]:
            assert iou(boxes[a], boxes[b]) <= thr
    # every dropped box overlaps some kept box with >= its own score
    for j in range(len(boxes)):
        if j not in kept:
            assert any(iou(boxes[j], boxes[k]) > thr and scores[k] >= scores[j]
                       for k in kept)


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(1, 50)),
                max_size=10))
@settings(max_examples=150, deadline=None)
def test_merge_intervals_disjoint_and_covering(pairs):
    ivals = [[a, a + w] for a, w in pairs]
    merged = merge_intervals(ivals)
    # sorted and disjoint (reference semantics: touching intervals merge)
    for (a0, a1), (b0, b1) in zip(merged, merged[1:]):
        assert a1 < b0
    # every input point is covered
    for a, b in ivals:
        assert any(m0 <= a and b <= m1 for m0, m1 in merged)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=300,
                unique=True))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_bulk(values):
    arr = np.array(values, dtype=np.uint64)
    bulk = HLL(p=10)
    if len(arr):
        bulk.add_ints(arr)
    merged = HLL(p=10)
    for chunk in np.array_split(arr, 4) if len(arr) else []:
        part = HLL(p=10)
        if len(chunk):
            part.add_ints(chunk)
        merged.merge_registers(part.registers)
    assert (merged.registers == bulk.registers).all()


@given(st.lists(st.floats(0.001, 1e6, allow_nan=False), min_size=1,
                max_size=500))
@settings(max_examples=50, deadline=None)
def test_ddsketch_quantile_within_alpha(values):
    sk = DDSketch(alpha=0.02)
    sk.add(np.array(values))
    s = sorted(values)
    for q in (0.1, 0.5, 0.9):
        exact = s[max(1, int(np.ceil(q * len(s)))) - 1]
        approx = sk.quantile(q)
        assert abs(approx - exact) <= 0.021 * exact + 1e-9


@given(st.lists(st.integers(0, 2**63 - 1), min_size=2, max_size=200,
                unique=True))
@settings(max_examples=50, deadline=None)
def test_splitmix64_injective_on_inputs(values):
    h = splitmix64(np.array(values, dtype=np.uint64))
    assert len(np.unique(h)) == len(values)


@given(st.lists(st.integers(0, (1 << 32) - 1), min_size=1, max_size=64),
       st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_mersenne_mul_matches_bigint(hashes, seed):
    """The overflow-free modular multiply equals exact Python-int math."""
    from pdf_extract_kit_ray.pipelines.dedup import (_MERSENNE, _mersenne_mul,
                                                     _perm_params)
    a, b = _perm_params(8, seed=seed % 1000 + 1)
    h = np.array(hashes, dtype=np.uint64)
    got = (_mersenne_mul(a, h) + b[:, None]) % _MERSENNE
    exp = np.array([[(int(ai) * int(hi) + int(bi)) % _MERSENNE
                     for hi in h] for ai, bi in zip(a, b)], dtype=np.uint64)
    assert (got == exp).all()


@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=2, max_size=60,
                unique=True),
       st.integers(0, 4))
@settings(max_examples=50, deadline=None)
def test_hamming_pairs_match_bruteforce(sigs, max_h):
    from pdf_extract_kit_ray.pipelines.dedup import _hamming_pairs_vectorized
    s = np.array(sigs, dtype=np.uint64)
    ids = np.arange(len(s), dtype=np.int64)
    k, d, h = _hamming_pairs_vectorized(ids, s, max_h, tile=16)
    got = {(int(a), int(b), int(x)) for a, b, x in zip(k, d, h)}
    exp = {(i, j, bin(int(s[i]) ^ int(s[j])).count("1"))
           for i in range(len(s)) for j in range(i + 1, len(s))
           if bin(int(s[i]) ^ int(s[j])).count("1") <= max_h}
    assert got == exp


@given(st.integers(1, 8000), st.integers(1, 8000))
@settings(max_examples=100, deadline=None)
def test_render_geometry_dims(w, h):
    """Downshift iff a side exceeds 3000; effective dims always <= 3000 when
    the input is at most 6000 (one halving, like the reference's single
    dpi-72 re-render)."""
    from pdf_extract_kit_ray.sources.corpus import render_geometry
    ew, eh, scale = render_geometry(w, h)
    if w <= 3000 and h <= 3000:
        assert (ew, eh, scale) == (w, h, 1.0)
    else:
        assert scale == 0.5 and ew == w // 2 and eh == h // 2


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 255))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, fill):
    """Any RGB array encodes to a PNG whose inflated scanlines reproduce
    the pixel bytes exactly (filter-0 layout)."""
    import struct
    import zlib

    from pdf_extract_kit_ray.stages.visualize import encode_png
    rng = np.random.RandomState(fill)
    rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    png = encode_png(rgb)
    off, idat = 8, b""
    while off < len(png):
        ln, tag = struct.unpack(">I4s", png[off:off + 8])
        if tag == b"IDAT":
            idat += png[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * 3)
    assert (rows[:, 0] == 0).all()
    assert (rows[:, 1:] == rgb.reshape(h, w * 3)).all()


@given(st.lists(st.integers(0, 10**7), min_size=1, max_size=300),
       st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_sliding_window_conservation(ts_secs, k):
    """Every event lands in exactly min(k, windows-since-stream-head)
    windows; with the head guard, total window-membership count is bounded
    by k x n and each event's memberships are consecutive window ids."""
    slide = 900
    window = slide * k
    ts = np.array(sorted(ts_secs), dtype=np.int64)
    w0 = ts // slide
    memberships = []
    for off in range(k):
        w = w0 - off
        ok = ts < w * slide + window
        memberships.append(ok)
    per_event = np.stack(memberships).sum(axis=0)
    # window w covers [w*slide, w*slide + window): event at t belongs to w
    # iff w*slide <= t-ish; with non-negative t every offset qualifies
    assert (per_event == k).all()


@given(st.integers(2, 400), st.integers(0, 2**16 - 1), st.integers(16, 64))
@settings(max_examples=40, deadline=None)
def test_segment_candidates_linear_bound(n, sub_const, cap):
    """Identical-sub segments (worst case) emit at most 2(n-1) candidate
    edges — the star+chain linear bound — and never a<b violations."""
    from pdf_extract_kit_ray.pipelines.multimodal import _segment_candidates
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    sub = np.full(n, sub_const, dtype=np.int64)
    a, b = _segment_candidates(ids, sub, cap=cap)
    assert (a < b).all()
    if n > cap:
        assert len(a) <= 2 * (n - 1)
    else:
        assert len(a) == n * (n - 1) // 2


# --- PII regex parity: Arrow RE2 kernels vs DuckDB RE2 on adversarial text
_pii_fragment = st.one_of(
    st.text(alphabet="abcdefXYZ0123456789 .@-+_%\n\t", max_size=20),
    st.sampled_from([
        "a@b.co", "alice.smith+x@example.org", "not@an@email",
        "1.2.3.4", "999.999.999.999", "10.0.0.1.2", "1.2.3",
        "555-867-5309", "555.123.4567", "12-34-5678", "555-8675-309",
        "x@y.z", "@@", "127.0.0.1:8080", "+1 555-123-4567",
    ]))


@given(st.lists(_pii_fragment, min_size=0, max_size=8))
@settings(max_examples=60, deadline=None)
def test_pii_patterns_arrow_duckdb_parity(fragments):
    """The three PII regexes behave identically in Arrow and DuckDB (both
    RE2) for counting AND replacement, on adversarial near-miss text —
    the property the pii_redact oracle twin relies on."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    from pdf_extract_kit_ray.pipelines.curation import (PII_EMAIL, PII_IP,
                                                        PII_PHONE)
    text = " ".join(fragments)
    arr = pa.array([text], pa.string())
    clean = pc.replace_substring_regex(arr, PII_EMAIL, "[EMAIL]")
    clean = pc.replace_substring_regex(clean, PII_IP, "[IP]")
    clean = pc.replace_substring_regex(clean, PII_PHONE, "[PHONE]")
    counts = [pc.count_substring_regex(arr, p)[0].as_py()
              for p in (PII_EMAIL, PII_IP, PII_PHONE)]

    con = duckdb.connect()
    row = con.execute(
        """SELECT len(regexp_extract_all($1, $2)),
                  len(regexp_extract_all($1, $3)),
                  len(regexp_extract_all($1, $4)),
                  regexp_replace(regexp_replace(regexp_replace($1,
                      $2, '[EMAIL]', 'g'), $3, '[IP]', 'g'),
                      $4, '[PHONE]', 'g')""",
        [text, PII_EMAIL, PII_IP, PII_PHONE]).fetchone()
    assert counts == list(row[:3])
    assert clean[0].as_py() == row[3]


# --- shared pair-verification primitive vs naive reference
_ids_st = st.lists(st.integers(0, 40), min_size=1, max_size=15, unique=True)


@given(_ids_st,
       st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=0, max_size=25),
       st.integers(1, 7))
@settings(max_examples=15, deadline=None)
def test_verify_candidate_pairs_matches_naive(item_ids, raw_pairs,
                                              num_coarse):
    """For random item sets and candidate pair lists (duplicates, self
    pairs, and dangling ids included), the distributed membership-union
    verifier hands the kernel exactly the deduped pairs whose BOTH sides
    have payloads — matching a naive dict-based reference."""
    import pyarrow as pa
    import ray.data
    from pdf_extract_kit_ray.functions.pairs import verify_candidate_pairs

    pairs = [(a, b) for a, b in raw_pairs if a != b]
    items = ray.data.from_arrow(pa.table({
        "id": pa.array(item_ids, pa.int64()),
        "text": pa.array([f"t{i}" for i in item_ids], pa.string())}))
    cand = ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64())}))

    def verify(a_ids, b_ids, pa_a, pa_b):
        return pa.table({"a": pa.array(a_ids, pa.int64()),
                         "b": pa.array(b_ids, pa.int64()),
                         "ta": pa_a, "tb": pa_b})

    out = verify_candidate_pairs(
        items, cand, id_col="id", payload_col="text",
        payload_type=pa.string(), num_coarse=num_coarse,
        verify=verify).to_pandas()
    got = {(r.a, r.b, r.ta, r.tb) for r in out.itertuples()}

    payload = {i: f"t{i}" for i in item_ids}
    want = {(a, b, payload[a], payload[b]) for a, b in set(pairs)
            if a in payload and b in payload}
    assert got == want
