"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB shapes):

* **exact** — fingerprint inside ``map_batches`` (no text leaves the read
  stage), then ONE hash shuffle on the fingerprint with ``groupby`` keeping
  the minimum doc_id per group.  O(total bytes) map + small shuffle rows.
* **MinHash+LSH** — signature per doc (vectorized numpy, deterministic crc32
  shingle hashing — never Python ``hash()``, which is per-process salted),
  exploded to (band, band_hash, doc_id) rows, ONE shuffle grouping band
  buckets, candidate pairs emitted per bucket against the bucket's minimum
  doc_id (linear in bucket size, not quadratic), then a verification join
  that re-reads only candidate docs (hash-partitioned on doc_id at scale; the
  candidate set is orders of magnitude smaller than the corpus).
* **SimHash** — 64-bit signature, split into 4×16-bit bands for Hamming≤3
  candidate generation (pigeonhole: any pair within distance 3 shares an
  exact band), same bucket-groupby shape.

Every signature function is deterministic across workers and runs.
"""

from __future__ import annotations

import zlib
from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.joins import sized_read_parquet
from ray.data.aggregate import Count, Min, Sum

from .text import fingerprint_batch

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def _perm_params(num_perm: int, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def word_shingles(text: "str | None", k: int = 3) -> Set[str]:
    if text is None:          # null text: no shingles, joins never see it
        return set()
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    sh = word_shingles(text, k)
    if not sh:
        return np.array([0], dtype=np.uint64)
    return np.fromiter((zlib.crc32(s.encode("utf-8")) for s in sh),
                       dtype=np.uint64, count=len(sh))


def _mersenne_mul(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(outer(a, h)) mod 2^61-1 without uint64 overflow (a < 2^61, h < 2^32).

    a = a_hi*2^32 + a_lo.  a_lo*h < 2^64 fits exactly and Mersenne-folds;
    a_hi*h < 2^61, and multiplying by 2^32 mod 2^61-1 is a 61-bit rotation
    (q*2^61 + r*2^32 ≡ q + r*2^32), so nothing ever wraps."""
    M = np.uint64(_MERSENNE)
    a_hi = a >> np.uint64(32)
    a_lo = a & np.uint64(0xFFFFFFFF)
    t_lo = np.outer(a_lo, h)                       # < 2^64, exact
    t_lo = (t_lo >> np.uint64(61)) + (t_lo & M)    # < 2^61 + 8
    t_hi = np.outer(a_hi, h)                       # < 2^61
    t_hi = ((t_hi & np.uint64((1 << 29) - 1)) << np.uint64(32)) \
        + (t_hi >> np.uint64(29))                  # *2^32 mod M, < 2^61+2^32
    return t_lo + t_hi                             # < 2^63, caller reduces


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 3) -> np.ndarray:
    """num_perm 32-bit minhash values via a true Mersenne-prime universal
    hash family over crc32 shingle hashes — the modular multiply is done
    overflow-free (see _mersenne_mul), so collision probability ≈ Jaccard
    holds as documented (ADVICE round 1)."""
    h = _shingle_hashes(text, k)
    # (num_perm, n_shingles) universal hashes, min over shingles
    vals = (_mersenne_mul(a, h) + b[:, None]) % _MERSENNE & _MAX_HASH
    return vals.min(axis=1).astype(np.uint32)


def simhash64(text: str, k: int = 2) -> int:
    """64-bit SimHash over word k-shingles (crc32 seeds spread to 64 bits by
    a splitmix-style mix, vectorized over all shingles; uint64 wraparound is
    the intended hashing arithmetic)."""
    sh = word_shingles(text, k)
    if not sh:
        return 0
    x = np.fromiter((zlib.crc32(s.encode("utf-8")) for s in sh),
                    dtype=np.uint64, count=len(sh))
    x = x * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    bits = (x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = np.where(bits == 1, 1, -1).sum(axis=0)
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Group by content fingerprint; keep the minimum doc_id per group.
    Returns (fp, keep_id, n) — the canonical doc and duplicate count per
    distinct content."""
    from ..functions.agg import coarse_grouped_aggregate

    def fp(batch: pa.Table) -> pa.Table:
        t = pa.table({"fp": fingerprint_batch(batch),
                      "doc_id": batch.column("doc_id")})
        # per-batch partial combine (min doc_id + count per fp), then the
        # coarse Arrow aggregate: fp cardinality ~ corpus size, which is
        # exactly where Dataset.aggregate's per-group reduce collapses
        g = t.group_by("fp").aggregate([("doc_id", "min"),
                                        ([], "count_all")])
        return g.rename_columns(["fp", "partial_keep", "partial_n"])

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return coarse_grouped_aggregate(
        ds.map_batches(fp, batch_format="pyarrow"), "fp",
        [("partial_keep", "min", "keep_id"), ("partial_n", "sum", "n")])


def curated_docs(sf_dir: str, min_quality: float = 0.5) -> "ray.data.Dataset":
    """The canonical training-data curation composition: quality filter ->
    exact content dedup keeping the lowest doc_id -> (doc_id, quality).

    One map computes fingerprint + quality per batch; ONE shuffle reduces
    each fingerprint group with a native Min aggregate over a packed
    (doc_id, quality-micro) integer — no map_groups, no second read, no
    driver state.  quality is packed as exact micro-units so unpacking
    reproduces the SQL twin's rounded double bit-for-bit (the score itself
    is the shared ``text.quality_score`` definition, DuckDB-compatible
    rounding included)."""
    from .text import fingerprint_batch, quality_score

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        quality = quality_score(batch.column("text"))
        # filter BEFORE fingerprinting: the per-row md5 is the dominant map
        # cost and dropped rows must not pay it
        batch_q = batch.append_column("q_micro", pc.cast(
            pc.round(pc.multiply(quality, 1000000.0)), pa.int64())) \
            .filter(pc.greater_equal(quality, min_quality))
        # pack (doc_id, quality) so min(pack) selects the min doc_id and
        # carries its quality through a native aggregate
        pack = pc.add(pc.multiply(batch_q.column("doc_id"), 10_000_000),
                      batch_q.column("q_micro"))
        t = pa.table({"fp": fingerprint_batch(batch_q), "pack": pack})
        # per-batch partial min before the coarse Arrow aggregate (fp
        # cardinality ~ corpus size)
        return t.group_by("fp").aggregate([("pack", "min")]) \
            .rename_columns(["fp", "pack"])

    from ..functions.agg import coarse_grouped_aggregate
    agg = coarse_grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"), "fp",
        [("pack", "min", "pack")])

    def unpack(batch: pa.Table) -> pa.Table:
        pack = batch.column("pack")
        return pa.table({
            "doc_id": pc.divide(pack, 10_000_000),
            "quality": pc.divide(pc.cast(
                pc.subtract(pack, pc.multiply(
                    pc.divide(pack, 10_000_000), 10_000_000)),
                pa.float64()), 1000000.0),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def dedup_keep_best(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup keeping the BEST copy: within each exact-duplicate
    cluster (normalized-text fingerprint) keep the doc with the highest
    quality score, tie-broken by lowest doc_id — the curation policy a
    training-data pipeline actually wants (``exact_dedup``/``curated_docs``
    keep the min doc_id, i.e. an arbitrary canonical copy).

    Same one-shuffle shape as ``curated_docs``: the map computes
    fingerprint + quality per batch and packs ``(1e6 - quality_micro,
    doc_id)`` into ONE int64 so a native Min aggregate selects
    (max quality, then min doc_id) and carries both through the coarse
    fingerprint shuffle — no map_groups, no second read.  Requires
    ``0 <= doc_id < 1e12`` (checked per batch; quality is bounded [0,1]
    by construction).  A per-batch partial count rides along so the
    output also reports each kept doc's cluster size ``n_copies``.

    NULL text fingerprints to the ``"(null)"`` sentinel class, matching
    SQL ``GROUP BY``'s all-NULLs-are-one-group semantics (mirrored by
    COALESCE in the twin): all null docs form one cluster with quality
    0.0, keeping the lowest doc_id."""
    from ..functions.agg import coarse_grouped_aggregate
    from .text import fingerprint_batch, quality_score

    _ID_BASE = 1_000_000_000_000
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id")
        if batch.num_rows:
            lo, hi = pc.min_max(doc_id).values()
            if lo.as_py() < 0 or hi.as_py() >= _ID_BASE:
                raise ValueError(
                    f"dedup_keep_best packs doc_id into 12 decimal digits; "
                    f"got doc_id range [{lo}, {hi}]")
        q_micro = pc.cast(pc.round(pc.multiply(
            quality_score(batch.column("text")), 1000000.0)), pa.int64())
        pack = pc.add(pc.multiply(pc.subtract(pa.scalar(1_000_000,
                                                        pa.int64()),
                                              q_micro), _ID_BASE), doc_id)
        fp = pc.fill_null(fingerprint_batch(batch), "(null)")
        return (pa.table({"fp": fp, "pack": pack})
                .group_by("fp")
                .aggregate([("pack", "min"), ([], "count_all")])
                .rename_columns(["fp", "pack", "partial_c"]))

    agg = coarse_grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"), "fp",
        [("pack", "min", "pack"), ("partial_c", "sum", "n_copies")])

    def unpack(batch: pa.Table) -> pa.Table:
        pack = batch.column("pack")
        neg_q = pc.divide(pack, _ID_BASE)
        return pa.table({
            "doc_id": pc.subtract(pack, pc.multiply(neg_q, _ID_BASE)),
            "quality": pc.divide(pc.cast(
                pc.subtract(pa.scalar(1_000_000, pa.int64()), neg_q),
                pa.float64()), 1000000.0),
            "n_copies": pc.cast(batch.column("n_copies"), pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

# rows per coarse shuffle group for bucket-pair emission: each map_groups
# call processes MANY (band, hash) buckets vectorized, because per-group
# dispatch (~50us) dominates a groupby whose buckets are mostly singletons
_COARSE_ROWS = 4096


def _num_coarse(n_rows: int) -> int:
    return max(32, n_rows // _COARSE_ROWS)


def _candidate_pairs_ds(ds: "ray.data.Dataset", text_col: str,
                        id_col: str, num_perm: int, bands: int,
                        shingle_k: int) -> "ray.data.Dataset":
    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm)
    # parquet metadata count: sizes the coarse shuffle key space so each
    # group holds ~_COARSE_ROWS rows at ANY corpus size
    num_coarse = _num_coarse(ds.count() * bands)

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = {"band_id": [], "band_hash": [], id_col: []}
        for doc_id, text in zip(ids, texts):
            if text is None:      # null text: no signature, never a candidate
                continue
            sig = minhash_signature(text, a, b, shingle_k)
            for band in range(bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                out["band_id"].append(band)
                out["band_hash"].append(zlib.crc32(chunk.tobytes()))
                out[id_col].append(doc_id)
        band_id = np.asarray(out["band_id"], dtype=np.int64)
        band_hash = np.asarray(out["band_hash"], dtype=np.int64)
        coarse = (band_id * np.int64(0x9E3779B1) + band_hash) % num_coarse
        return pa.table({"coarse": pa.array(coarse, pa.int64()),
                         "band_id": pa.array(band_id, pa.int32()),
                         "band_hash": pa.array(band_hash, pa.int64()),
                         id_col: pa.array(out[id_col])})

    def coarse_pairs(group: pa.Table) -> pa.Table:
        """All (band, hash) buckets hashed into this coarse group, pair-
        emitted vectorized: sort by (band, hash, id), segment boundaries,
        rep = segment minimum, pairs = (rep, every other member)."""
        band = group.column("band_id").to_numpy()
        h = group.column("band_hash").to_numpy()
        ids = group.column(id_col).to_numpy()
        order = np.lexsort((ids, h, band))
        band, h, ids = band[order], h[order], ids[order]
        new_seg = np.r_[True, (band[1:] != band[:-1]) | (h[1:] != h[:-1])]
        seg_id = np.cumsum(new_seg) - 1
        rep = ids[new_seg][seg_id]
        mask = ~new_seg
        return pa.table({"keep_id": pa.array(rep[mask], pa.int64()),
                         "dup_id": pa.array(ids[mask], pa.int64())})

    return (ds.map_batches(signatures, batch_format="pyarrow")
              .groupby("coarse")
              .map_groups(coarse_pairs, batch_format="pyarrow"))


def minhash_dedup(sf_dir: str, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.5,
                  table: str = "documents") -> "ray.data.Dataset":
    """Near-duplicate pairs (keep_id < dup_id) whose verified word-shingle
    Jaccard similarity is >= threshold.

    Verification is FULLY DISTRIBUTED via the shared membership-union
    semi-join primitive (``functions.pairs.verify_candidate_pairs``):
    corpus text ships through exactly ONE hash shuffle, candidate pairs
    explode to per-doc membership rows, and a candidate-sized groupby
    computes exact Jaccard per pair — nothing materializes on the driver.

    The DuckDB twin replays the WHOLE tier bit-exactly — including a
    crc32 implementation as a recursive CTE over shingle bytes, the
    Mersenne universal signature family with the engine's literal
    permutation parameters, band-chunk crc bucketing (collisions and
    all), and the bucket-min candidate pairing — so the hash gate pins
    LSH candidates, not just the verified output shape.
    """
    from ..functions.pairs import verify_candidate_pairs

    path = f"{sf_dir}/{table}.parquet"
    ds = sized_read_parquet(path, columns=["doc_id", "text"])
    cand = _candidate_pairs_ds(ds, "text", "doc_id", num_perm, bands, shingle_k)
    # coarse-bucketed verification shuffles (per-key map_groups dispatch —
    # one call per doc — dominated the round-2 runtime; hashing many keys
    # into each group keeps the group bodies vectorized/amortized)
    num_coarse = _num_coarse(ds.count())

    def verify(keep_ids, dup_ids, texts_a, texts_b) -> pa.Table:
        """Exact Jaccard per complete pair (keep side aligned first)."""
        from ..functions.num import round6
        ta, tb = texts_a.to_pylist(), texts_b.to_pylist()
        raw = np.fromiter((jaccard(ta[i], tb[i], shingle_k)
                           for i in range(len(keep_ids))),
                          np.float64, count=len(keep_ids))
        # ONE vectorized round6 over the batch (the scale-multiply twin
        # convention — Python round() can land one ulp away), then a
        # vectorized threshold filter: no per-pair Arrow scalar churn in
        # the candidate-sized hot path
        j = round6(pa.array(raw, pa.float64()))
        keep = pc.greater_equal(j, threshold)
        return pa.table({
            "keep_id": pa.array(keep_ids, pa.int64()).filter(keep),
            "dup_id": pa.array(dup_ids, pa.int64()).filter(keep),
            "jaccard": j.filter(keep)})

    return verify_candidate_pairs(
        ds, cand, id_col="doc_id", payload_col="text",
        payload_type=pa.string(), num_coarse=num_coarse, verify=verify,
        a_col="keep_id", b_col="dup_id")


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------

# 256-entry byte popcount table (no popcount ufunc in this numpy)
_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(axis=1).astype(np.uint8)

# above this bucket population, fall back to prefix-extended banding
# instead of the O(n^2) all-pairs scan
_SIMHASH_BUCKET_CAP = 2048


def _hamming_pairs_vectorized(ids: np.ndarray, sigs: np.ndarray,
                              max_hamming: int, tile: int = 1024):
    """All (i < j) pairs with popcount(sigs[i]^sigs[j]) <= max_hamming,
    tiled XOR + byte-table popcount (vectorized; memory bounded by
    tile^2 * 8 bytes).  Returns (keep, dup, dist) index arrays."""
    n = len(ids)
    keeps, dups, dists = [], [], []
    for i0 in range(0, n, tile):
        a = sigs[i0:i0 + tile]
        for j0 in range(i0, n, tile):
            b = sigs[j0:j0 + tile]
            x = a[:, None] ^ b[None, :]
            d = _POPCOUNT8[x.view(np.uint8)].reshape(len(a), len(b), 8) \
                .sum(axis=2, dtype=np.uint16)
            ii, jj = np.nonzero(d <= max_hamming)
            gi, gj = ii + i0, jj + j0
            m = gi < gj
            if m.any():
                keeps.append(gi[m]); dups.append(gj[m])
                dists.append(d[ii[m], jj[m]])
    if not keeps:
        z = np.array([], dtype=np.int64)
        return z, z, z.astype(np.int32)
    return (np.concatenate(keeps), np.concatenate(dups),
            np.concatenate(dists).astype(np.int32))


def _band_remainder(sigs: np.ndarray, band_id: int) -> np.ndarray:
    """The 48 signature bits OUTSIDE the given 16-bit band, packed low."""
    shift = np.uint64(16 * band_id)
    low = sigs & ((np.uint64(1) << shift) - np.uint64(1))
    high = sigs >> (shift + np.uint64(16))
    return low | (high << shift)


def _simhash_bucket_pairs(ids: np.ndarray, sigs: np.ndarray, band_id: int,
                          max_hamming: int):
    """Pairs within one (band, band_hash) bucket.

    Small buckets: one vectorized all-pairs scan.  Oversized buckets (a
    16-bit band gives only 65,536 buckets, so at 10^9+ docs the population
    goes quadratic): prefix-extended banding — the 48 bits outside the
    matched band carry all <= max_hamming differing bits, so by pigeonhole
    any qualifying pair also agrees on one of 4 12-bit sub-bands; scan only
    within sub-buckets and dedupe pairs that collide in several."""
    if len(ids) <= _SIMHASH_BUCKET_CAP:
        return _hamming_pairs_vectorized(ids, sigs, max_hamming)
    rem = _band_remainder(sigs, band_id)
    seen = set()
    keeps, dups, dists = [], [], []
    for sub in range(4):
        sub_key = (rem >> np.uint64(12 * sub)) & np.uint64(0xFFF)
        order = np.argsort(sub_key, kind="stable")
        sorted_keys = sub_key[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])
        bounds = np.r_[starts, len(sorted_keys)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            idx = order[s:e]
            k, d, h = _hamming_pairs_vectorized(ids[idx], sigs[idx],
                                                max_hamming)
            for ki, di, hi in zip(idx[k], idx[d], h):
                a, b = (ki, di) if ki < di else (di, ki)
                if (a, b) not in seen:
                    seen.add((a, b))
                    keeps.append(a); dups.append(b); dists.append(hi)
    return (np.asarray(keeps, dtype=np.int64),
            np.asarray(dups, dtype=np.int64),
            np.asarray(dists, dtype=np.int32))


def simhash_dedup(sf_dir: str, max_hamming: int = 3,
                  table: str = "documents") -> "ray.data.Dataset":
    """Near-duplicate pairs by 64-bit SimHash Hamming distance <= max_hamming,
    candidates via 4×16-bit band buckets (pigeonhole-complete for distance 3).
    In-bucket comparison is tiled XOR+popcount (vectorized), with oversized
    buckets split by prefix-extended sub-banding (_simhash_bucket_pairs).

    ``max_hamming`` must be <= 3: both the outer 4x16-bit banding and the
    oversized-bucket 4x12-bit sub-banding are pigeonhole-complete only for
    distance 3 — a larger radius would silently lose recall.

    SQL twin: the same crc32-CTE shingle hashes, avalanche mix, bit
    votes, band buckets and per-half bit_count Hamming — pigeonhole
    completeness makes plain within-bucket all-pairs the same pair set
    the sub-banding path finds, at any bucket population."""
    if max_hamming > 3:
        raise ValueError(
            f"simhash_dedup supports max_hamming <= 3 (got {max_hamming}): "
            "the 4-band pigeonhole guarantee does not cover larger radii")
    path = f"{sf_dir}/{table}.parquet"
    ds = sized_read_parquet(path, columns=["doc_id", "text"])

    num_coarse = _num_coarse(ds.count() * 4)

    def signatures(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"band_id": [], "band_hash": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            if text is None:      # null text: no signature, never a candidate
                continue
            sig = simhash64(text)
            for band in range(4):
                out["band_id"].append(band)
                out["band_hash"].append((sig >> (16 * band)) & 0xFFFF)
                out["doc_id"].append(doc_id)
                out["sig"].append(sig)
        band_id = np.asarray(out["band_id"], dtype=np.int64)
        band_hash = np.asarray(out["band_hash"], dtype=np.int64)
        coarse = (band_id * np.int64(0x9E3779B1) + band_hash) % num_coarse
        return pa.table({"coarse": pa.array(coarse, pa.int64()),
                         "band_id": pa.array(band_id, pa.int32()),
                         "band_hash": pa.array(band_hash, pa.int32()),
                         "doc_id": pa.array(out["doc_id"], pa.int64()),
                         "sig": pa.array(out["sig"], pa.uint64())})

    def coarse_pairs(group: pa.Table) -> pa.Table:
        """Vectorized over every (band, hash) bucket hashed into this
        coarse group; only multi-member segments run the Hamming scan."""
        band = group.column("band_id").to_numpy()
        h = group.column("band_hash").to_numpy()
        ids = group.column("doc_id").to_numpy()
        sigs = group.column("sig").to_numpy()
        order = np.lexsort((ids, h, band))
        band, h, ids, sigs = band[order], h[order], ids[order], sigs[order]
        new_seg = np.r_[True, (band[1:] != band[:-1]) | (h[1:] != h[:-1])]
        bounds = np.r_[np.flatnonzero(new_seg), len(ids)]
        keeps, dups, dists = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            k, d, hh = _simhash_bucket_pairs(ids[s:e], sigs[s:e],
                                             int(band[s]), max_hamming)
            keeps.append(ids[s:e][k]); dups.append(ids[s:e][d]); dists.append(hh)
        if not keeps:
            return pa.table({"keep_id": pa.array([], pa.int64()),
                             "dup_id": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})
        return pa.table({
            "keep_id": pa.array(np.concatenate(keeps), pa.int64()),
            "dup_id": pa.array(np.concatenate(dups), pa.int64()),
            "hamming": pa.array(np.concatenate(dists), pa.int32())})

    pairs = (ds.map_batches(signatures, batch_format="pyarrow")
               .groupby("coarse")
               .map_groups(coarse_pairs, batch_format="pyarrow"))
    # distinct pairs (a pair can surface from several bands)
    return pairs.groupby(["keep_id", "dup_id"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise over a bounded subset; SQL-matchable)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        max_doc: int = 300, k: int = 3) -> "ray.data.Dataset":
    """All-pairs word-3-gram Jaccard over the ``doc_id < max_doc`` subset:
    shingle sets are built once, broadcast via ``ray.put``, and each task
    compares its block's docs against the broadcast docs with larger ids —
    the O(n²) work is sharded by the left side.

    This is the *exact bounded* variant (a DuckDB-checkable oracle).  At
    corpus scale the same comparison runs only on LSH candidate pairs
    (``minhash_dedup``): signature -> band buckets -> candidates -> this
    exact Jaccard as the verification predicate."""
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def subset(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("doc_id"), max_doc))

    sub = ds.map_batches(subset, batch_format="pyarrow")
    # the broadcast side is the bounded subset by contract (doc_id <
    # max_doc); load it with a pushed-down parquet filter rather than a
    # full Ray pass drained on the driver
    import pyarrow.dataset as pads
    side_tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id") < max_doc)
    side = {}
    for doc_id, text in zip(side_tbl.column("doc_id").to_pylist(),
                            side_tbl.column("text").to_pylist()):
        sh = word_shingles(text, k)
        if sh:
            side[doc_id] = sh
    side_ref = ray.put(side)

    def pairs(batch: pa.Table) -> pa.Table:
        shingles = ray.get(side_ref)
        out_a, out_b, out_j = [], [], []
        for a in batch.column("doc_id").to_pylist():
            sa = shingles.get(a)
            if sa is None:
                continue
            for b, sb in shingles.items():
                if b <= a:
                    continue
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(a); out_b.append(b); out_j.append(j)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return sub.map_batches(pairs, batch_format="pyarrow")


def _batch_ngrams(text: "pa.ChunkedArray | pa.Array",
                  n: int) -> Tuple[pa.Array, np.ndarray]:
    """Vectorized word-n-gram extraction for a whole batch: ONE Arrow
    lower+trim+whitespace-split, then n shifted takes of the flat token
    array joined element-wise — no per-row Python.  Returns (grams,
    doc_index, pos) where doc_index maps each gram to its row in the batch
    and pos is the gram's 0-based token offset within its document."""
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(text))
    split = pc.utf8_split_whitespace(trimmed)
    arr = (split.combine_chunks()
           if isinstance(split, pa.ChunkedArray) else split)
    off = arr.offsets.to_numpy().astype(np.int64)
    n_tok = np.diff(off)
    n_tok = np.where(np.asarray(pc.equal(trimmed, "")), 0, n_tok)
    n_grams = np.maximum(n_tok - n + 1, 0)
    total = int(n_grams.sum())
    if total == 0:
        return (pa.array([], pa.string()), np.array([], dtype=np.int64),
                np.array([], dtype=np.int64))
    doc_rep = np.repeat(np.arange(len(n_tok)), n_grams)
    cum = np.cumsum(n_grams) - n_grams
    pos = np.arange(total) - cum[doc_rep]
    starts = off[doc_rep] + pos
    flat = arr.values
    cols = [flat.take(pa.array(starts + j, pa.int64())) for j in range(n)]
    grams = pc.binary_join_element_wise(*cols, " ")
    return grams, doc_rep, pos


def contamination_check(sf_dir: str, n: int = 8,
                        bench_mask: int = 7) -> "ray.data.Dataset":
    """Benchmark n-gram decontamination — the training-data hygiene op:
    flag every corpus document sharing at least one word-8-gram with the
    held-out benchmark set, with the number of overlapping gram
    occurrences.  The benchmark here is the deterministic pseudo-eval
    subset ``doc_id & bench_mask == 0`` (~1/(bench_mask+1) of docs);
    in production it is an external eval-suite file.

    Scale shape: real benchmark suites are MBs, so the bench gram set is
    the classic SMALL SIDE — built once from a pushed-down parquet read,
    deduped, shipped via ``ray.put``, and membership-tested inside every
    map task with a vectorized ``pc.is_in``.  The corpus side streams:
    one Arrow split + n shifted takes per batch, a bincount per doc —
    a pure map with NO shuffle at any corpus size."""
    import pyarrow.dataset as pads

    bench_tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pc.bit_wise_and(pads.field("doc_id"), bench_mask) == 0)
    bench_grams, _, _ = _batch_ngrams(bench_tbl.column("text"), n)
    bench_set = pc.unique(bench_grams)
    bench_ref = ray.put(bench_set)

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def hits(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        ids_col = batch.column("doc_id")
        keep = pc.not_equal(
            pc.bit_wise_and(ids_col, bench_mask), 0)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return empty
        grams, doc_rep, _ = _batch_ngrams(batch.column("text"), n)
        if len(grams) == 0:
            return empty
        member = np.asarray(
            pc.is_in(grams, value_set=ray.get(bench_ref)))
        per_doc = np.bincount(doc_rep, weights=member,
                              minlength=batch.num_rows).astype(np.int64)
        contaminated = np.flatnonzero(per_doc > 0)
        if len(contaminated) == 0:
            return empty
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(contaminated, pa.int64())),
            "n_hits": pa.array(per_doc[contaminated], pa.int64()),
        })

    return ds.map_batches(hits, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling hash; Schleimer et al., SIGMOD 2003)
# ---------------------------------------------------------------------------

_WINNOW_BASE = np.uint64(1000003)


def winnow_fingerprints(text: str, k: int = 16, w: int = 8) -> np.ndarray:
    """Winnowed k-gram rolling-hash fingerprints of a document.

    Polynomial rolling hash over the normalized character stream (mod 2^64
    via uint64 wraparound), then winnowing: the minimum hash of every
    w-window is selected (rightmost minimum, the standard tie rule), and
    selections dedupe.  Guarantees any shared substring of length >= k+w-1
    yields a shared fingerprint."""
    norm = " ".join(text.lower().split())
    codes = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(codes) - k + 1
    if n <= 0:
        return np.array([], dtype=np.uint64)
    # h[i] = sum_j codes[i+j] * B^(k-1-j): k shifted vector FMAs under
    # uint64 wraparound (the intended mod-2^64 arithmetic — overflow is
    # the hash, not an error)
    powers = _WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            h += codes[j:j + n] * powers[j]
    if n <= w:
        return np.unique(h.min(keepdims=True))
    windows = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum per window
    rev_argmin = w - 1 - np.argmin(windows[:, ::-1], axis=1)
    picks = windows[np.arange(len(windows)), rev_argmin]
    return np.unique(picks)


def winnow_neardup(sf_dir: str, k: int = 16, w: int = 8,
                   min_shared: int = 10) -> "ray.data.Dataset":
    """Near-dup pairs via shared winnowed fingerprints: explode
    (fingerprint, doc_id) rows, ONE shuffle grouping each fingerprint's
    posting list, emit (bucket-min doc, other doc) candidate pairs, then a
    second groupby counts shared fingerprints per pair and filters
    >= min_shared.  Same bucket-shape as MinHash LSH but with substring
    (not bag-of-shingles) guarantees."""
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    # ~100+ winnowed fps per document (w=8 keeps ~1/4 of k-gram hashes)
    num_coarse = _num_coarse(ds.count() * 128)

    def explode(batch: pa.Table) -> pa.Table:
        fps, ids = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            if text is None:      # null text: no fingerprints
                continue
            f = winnow_fingerprints(text, k, w)
            fps.append(f)
            ids.append(np.full(len(f), doc_id, dtype=np.int64))
        fp = np.concatenate(fps) if fps else np.array([], dtype=np.uint64)
        di = np.concatenate(ids) if ids else np.array([], dtype=np.int64)
        return pa.table({
            "coarse": pa.array((fp % np.uint64(num_coarse)).astype(np.int64),
                               pa.int64()),
            "fp": pa.array(fp, pa.uint64()),
            "doc_id": pa.array(di, pa.int64()),
        })

    def coarse_pairs(group: pa.Table) -> pa.Table:
        """Every fp bucket hashed into this coarse group, pair-emitted
        vectorized (rep = bucket-min doc, pairs linear in bucket size)."""
        fp = group.column("fp").to_numpy()
        ids = group.column("doc_id").to_numpy()
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        new_seg = np.r_[True, fp[1:] != fp[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        rep = ids[new_seg][seg_id]
        mask = ~new_seg
        return pa.table({"a": pa.array(rep[mask], pa.int64()),
                         "b": pa.array(ids[mask], pa.int64())})

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby("coarse").map_groups(coarse_pairs,
                                             batch_format="pyarrow"))

    # the pair-count reduction is COARSE-BUCKETED like every other
    # many-distinct-group shuffle here: Ray's native aggregate pays
    # ~30-100us per GROUP (measured: 4.5 s for a Sum over 154k mostly-
    # singleton pair groups at sf0.1 — over half the query; the same
    # reduction as ~40 coarse groups with a vectorized in-group segment
    # sum is 0.15 s).  The (a, b) pair packs into one int64 (doc ids
    # < 2^31 by the corpus contract) so segmenting is a single argsort.
    num_pair_coarse = num_coarse

    def count_ones(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["a", "b"]).aggregate([([], "count_all")])
        pair = pc.add(pc.multiply(g.column("a"), np.int64(1) << 32),
                      g.column("b"))
        return pa.table({
            "pcoarse": pc.cast(
                pc.bit_wise_and(pair, num_pair_coarse - 1)
                if (num_pair_coarse & (num_pair_coarse - 1)) == 0
                else pc.subtract(pair, pc.multiply(
                    pc.divide(pair, num_pair_coarse), num_pair_coarse)),
                pa.int64()),
            "pair": pair,
            "partial_n": g.column(2)})

    def seg_sum(group: pa.Table) -> pa.Table:
        pair = group.column("pair").to_numpy()
        v = group.column("partial_n").to_numpy()
        order = np.argsort(pair, kind="stable")
        pair, v = pair[order], v[order]
        new = np.r_[True, pair[1:] != pair[:-1]]
        seg = np.cumsum(new) - 1
        sums = np.bincount(seg, weights=v).astype(np.int64)
        firsts = pair[new]
        keep = sums >= min_shared
        firsts, sums = firsts[keep], sums[keep]
        return pa.table({
            "a": pa.array(firsts >> 32, pa.int64()),
            "b": pa.array(firsts & 0xFFFFFFFF, pa.int64()),
            "shared": pa.array(sums, pa.int64())})

    return (pairs.map_batches(count_ones, batch_format="pyarrow")
                 .groupby("pcoarse")
                 .map_groups(seg_sum, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# connected components over the duplicate graph (Hash-to-Min)
# ---------------------------------------------------------------------------

def _dup_edges(sf_dir: str, threshold: float, max_doc: int,
               k: int) -> "ray.data.Dataset":
    """Undirected edge list (a, b) of the duplicate graph: exact
    content-fingerprint matches (star edges to each group's min doc) union
    the n-gram Jaccard near-dup pairs.  Exact edges use the coarse-bucketed
    groupby shape (fingerprints hashed into ~4096-row shuffle groups,
    segments scanned vectorized) so the shuffle never dispatches per-doc."""
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    num_coarse = _num_coarse(ds.count())

    def fp_rows(batch: pa.Table) -> pa.Table:
        fp = fingerprint_batch(batch)
        t = pa.table({"fp": fp, "doc_id": batch.column("doc_id")})
        t = t.filter(pc.is_valid(t.column("fp")))   # null text: no edges
        # coarse shuffle key off the first 15 hex chars; segmentation below
        # is on the FULL fp string, so truncation cannot create false edges
        coarse = pa.array([int(h[:15], 16) % num_coarse
                           for h in t.column("fp").to_pylist()], pa.int64())
        return t.append_column("coarse", coarse)

    def star_edges(group: pa.Table) -> pa.Table:
        fp = np.asarray(group.column("fp").to_pylist(), dtype=object)
        ids = group.column("doc_id").to_numpy()
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        new_seg = np.r_[True, fp[1:] != fp[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        rep = ids[new_seg][seg_id]
        mask = ~new_seg
        return pa.table({"a": pa.array(rep[mask], pa.int64()),
                         "b": pa.array(ids[mask], pa.int64())})

    exact = (ds.map_batches(fp_rows, batch_format="pyarrow")
               .groupby("coarse")
               .map_groups(star_edges, batch_format="pyarrow"))

    def drop_j(batch: pa.Table) -> pa.Table:
        return batch.select(["a", "b"])

    near = ngram_jaccard_pairs(sf_dir, threshold, max_doc, k) \
        .map_batches(drop_j, batch_format="pyarrow")
    return exact.union(near)


def connected_components(edges: "ray.data.Dataset",
                         max_rounds: int = 12) -> "ray.data.Dataset":
    """Connected components over an (a, b) int64 edge Dataset, distributed
    as **Hash-to-Min** (Rastogi et al., ICDE 2012): the state is a Dataset
    of (node, member) adjacency rows; each round, every node's group
    computes m = min of its member set and emits (m, x) + (x, m) for every
    member x — the whole round is ONE coarse-bucketed groupby, no joins, no
    driver state, and it converges in O(log d) rounds to C_min = component,
    C_other = {min}.  Convergence is detected by a row-set checksum (count
    + keyed sum), two scalar aggregates per round on a materialized
    few-int-columns dataset; the iterative loop is the one pattern Ray Data
    cannot express declaratively, so the driver owns only the loop control,
    never the data.

    Output: (doc_id, cluster_id, cluster_size) for every node of the edge
    graph (components of size >= 2 by construction), cluster_id = the
    component-minimum node id.  The per-component group in the final
    emission holds one row per member — the same "component fits one
    group" bound any CC labeling has."""
    n_edges = edges.count()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64()),
                      "cluster_size": pa.array([], pa.int64())})
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    num_coarse = _num_coarse(4 * n_edges)

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        node = np.concatenate([a, b, a, b])
        member = np.concatenate([b, a, a, b])      # neighbors + self rows
        return pa.table({
            "coarse": pa.array(node % num_coarse, pa.int64()),
            "node": pa.array(node, pa.int64()),
            "member": pa.array(member, pa.int64())})

    def hash_to_min(group: pa.Table) -> pa.Table:
        """Many node-segments per coarse group; per node, emit (m, x) and
        (x, m) over its deduped member set, vectorized."""
        node = group.column("node").to_numpy()
        member = group.column("member").to_numpy()
        order = np.lexsort((member, node))
        node, member = node[order], member[order]
        keep = np.r_[True, (node[1:] != node[:-1]) | (member[1:] != member[:-1])]
        node, member = node[keep], member[keep]
        new_seg = np.r_[True, node[1:] != node[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        # min member per segment: members sorted within segment -> first row
        m = member[new_seg][seg_id]
        out_node = np.concatenate([np.where(new_seg, node, m),
                                   np.where(new_seg, node, member)])
        out_member = np.concatenate([np.where(new_seg, m, member),
                                     np.where(new_seg, m, m)])
        # the np.where trick: each segment's first row emits (node, m) for
        # both directions; subsequent rows emit (m, member) and (member, m)
        return pa.table({
            "coarse": pa.array(out_node % num_coarse, pa.int64()),
            "node": pa.array(out_node, pa.int64()),
            "member": pa.array(out_member, pa.int64())})

    state = edges.map_batches(seed, batch_format="pyarrow").materialize()
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        state = (state.groupby("coarse")
                      .map_groups(hash_to_min, batch_format="pyarrow")
                      .materialize())

        def sig_cols(batch: pa.Table) -> pa.Table:
            n = batch.column("node").to_numpy()
            mm = batch.column("member").to_numpy()
            return pa.table({"h": pa.array(
                (n * np.int64(1000003) + mm) % np.int64(1 << 62), pa.int64())})

        sig_ds = state.map_batches(sig_cols, batch_format="pyarrow")
        sig = (sig_ds.count(), sig_ds.sum("h"))
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # Hash-to-Min reach roughly squares per round, so non-convergence
        # within max_rounds means a pathologically deep component; emitting
        # the current labels would SILENTLY under-merge (multiple
        # cluster_ids for one true component), so fail loudly instead
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds; "
            f"raise max_rounds (components of diameter d need ~log2(d)+2)")

    def labels(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy()
        member = group.column("member").to_numpy()
        order = np.lexsort((member, node))
        node, member = node[order], member[order]
        new_seg = np.r_[True, node[1:] != node[:-1]]
        lbl = member[new_seg]
        n = node[new_seg]
        keep = lbl != n                      # drop the cluster-min self label
        out_n = np.concatenate([n[keep], lbl[keep]])
        out_l = np.concatenate([lbl[keep], lbl[keep]])
        t = pa.table({"doc_id": pa.array(out_n, pa.int64()),
                      "cluster_id": pa.array(out_l, pa.int64())})
        # the min node re-enters once per member; dedup before the shuffle
        g = t.group_by(["doc_id", "cluster_id"]).aggregate([([], "count_all")])
        return pa.table({
            "ccoarse": pc.cast(pc.bit_wise_and(
                g.column("cluster_id"), 0xFFFF), pa.int64()),
            "doc_id": g.column("doc_id"),
            "cluster_id": g.column("cluster_id")})

    def sized(group: pa.Table) -> pa.Table:
        cl = group.column("cluster_id").to_numpy()
        ids = group.column("doc_id").to_numpy()
        order = np.lexsort((ids, cl))
        cl, ids = cl[order], ids[order]
        # the (min, min) row is emitted once per coarse LABEL group above;
        # dedup across those emissions before counting members
        keep = np.r_[True, (cl[1:] != cl[:-1]) | (ids[1:] != ids[:-1])]
        cl, ids = cl[keep], ids[keep]
        new_seg = np.r_[True, cl[1:] != cl[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        sizes = np.bincount(seg_id)[seg_id]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster_id": pa.array(cl, pa.int64()),
                         "cluster_size": pa.array(sizes, pa.int64())})

    return (state.groupby("coarse")
                 .map_groups(labels, batch_format="pyarrow")
                 .groupby("ccoarse")
                 .map_groups(sized, batch_format="pyarrow"))


def dup_clusters(sf_dir: str, threshold: float = 0.5, max_doc: int = 300,
                 k: int = 3, max_rounds: int = 12) -> "ray.data.Dataset":
    """Duplicate-CLUSTER assignment: connected components over the
    near-duplicate graph (exact-fingerprint edges union n-gram Jaccard
    pairs), the step every dedup pipeline needs after pair emission
    (pairs -> components -> one representative per component).

    Output: (doc_id, cluster_id, cluster_size) for every doc in a
    component of size >= 2, cluster_id = component-minimum doc_id.

    Oracle: DuckDB recursive CTE propagating min labels over the same edge
    set (see __ray_entry__.oracle_sql)."""
    return connected_components(_dup_edges(sf_dir, threshold, max_doc, k),
                                max_rounds)


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (Lee et al. 2022, arXiv:2107.06499 shape)
# ---------------------------------------------------------------------------

def _string_coarse_hash(arr: "pa.Array", num_coarse: int) -> np.ndarray:
    """Vectorized coarse bucket key for a string array, straight off the
    Arrow buffers (no per-row Python): FNV-mix of length plus up to the
    first/last 8 bytes.  Equal strings always share a bucket; unequal
    strings spread well enough for a COARSE key (collisions only co-bucket,
    they never merge groups — the in-bucket segment scan compares the full
    strings)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # string offsets are int32; large_string's are int64 — reading a
    # large_string buffer as int32 silently produces garbage buckets
    # (equal strings then never co-bucket and downstream merges are lost)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                        count=len(arr) + 1,
                        offset=arr.offset * off_dtype().itemsize) \
        .astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts, ends = off[:-1], off[1:]
    ln = ends - starts
    nonempty = ln > 0
    FNV = np.uint64(0x100000001B3)
    h = ln.astype(np.uint64) * FNV
    for j in range(8):
        i1 = np.where(nonempty, np.minimum(starts + j, ends - 1), 0)
        b1 = data[i1].astype(np.uint64) * nonempty
        h = (h ^ b1) * FNV
        i2 = np.where(nonempty, np.maximum(ends - 1 - j, starts), 0)
        b2 = data[i2].astype(np.uint64) * nonempty
        h = (h ^ b2) * FNV
    return (h % np.uint64(num_coarse)).astype(np.int64)


def dup_spans(sf_dir: str, n: int = 8) -> "ray.data.Dataset":
    """Maximal duplicated-substring extents per document — the exact-
    substring-dedup shape of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), re-expressed over word n-grams instead
    of a monolithic suffix array: a token span is DUPLICATED when every
    ``n``-gram in it also occurs in some OTHER document; overlapping
    duplicated grams merge into maximal (doc_id, span_start, span_end)
    token extents — the ranges a substring-dedup pass would cut.

    Distributed shape (two shuffles, both coarse-bucketed so per-group
    dispatch amortizes and group bodies stay vectorized):

    1. **gram occurrences**: one vectorized pass emits (gram, doc_id, pos)
       per token position (the _batch_ngrams shifted-take join), with a
       coarse key hashed off the Arrow string buffer.
    2. **cross-doc filter**: groupby(coarse) sorts each bucket by
       (gram, doc_id) once; segment boundaries + a per-segment any(doc
       changed) bincount flag grams seen in >= 2 distinct docs — all numpy,
       no per-gram Python.  A pathologically hot gram costs its own
       occurrence count, linear not quadratic.
    3. **islands merge**: surviving (doc_id, st, en=st+n) hits shuffle once
       on a doc_id coarse key; a segmented running-max merges overlapping
       extents per doc (the gaps-and-islands scan, vectorized with a
       per-doc rank offset so one ``np.maximum.accumulate`` handles every
       doc in the bucket).

    At 100 TB the gram shuffle is the cost (one row per token); hashing the
    gram text down to int64 before the shuffle is the production knob (8x
    fewer shuffle bytes for a 2^-64 collision risk) — kept as text here so
    the DuckDB islands-merge twin is hash-exact.
    """
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    # ~tokens/doc estimate only sizes the coarse key space; correctness
    # never depends on it
    n_docs = ds.count()
    num_coarse = _num_coarse(n_docs * 64)
    num_coarse_docs = _num_coarse(n_docs)

    def gram_occ(batch: pa.Table) -> pa.Table:
        empty = pa.table({"coarse": pa.array([], pa.int64()),
                          "g": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        grams, doc_rep, pos = _batch_ngrams(batch.column("text"), n)
        if len(grams) == 0:
            return empty
        return pa.table({
            "coarse": pa.array(_string_coarse_hash(grams, num_coarse),
                               pa.int64()),
            "g": grams,
            "doc_id": batch.column("doc_id").take(
                pa.array(doc_rep, pa.int64())),
            "s": pa.array(pos, pa.int64()),
        })

    def cross_doc_hits(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("g", "ascending"),
                                                ("doc_id", "ascending")])
        g = group.take(idx)
        garr = g.column("g")
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        m = len(garr)
        if m < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        new_seg = np.r_[True, ~np.asarray(
            pc.equal(garr.slice(1), garr.slice(0, m - 1)))]
        seg_id = np.cumsum(new_seg) - 1
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        doc_change = np.r_[False, doc[1:] != doc[:-1]] & ~new_seg
        n_seg = seg_id[-1] + 1
        flagged = np.zeros(n_seg, dtype=bool)
        flagged[seg_id[doc_change]] = True
        keep = flagged[seg_id]
        kept = g.filter(pa.array(keep))
        return pa.table({"doc_id": kept.column("doc_id"),
                         "s": kept.column("s")})

    def add_doc_coarse(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = (d * np.int64(0x9E3779B1)) % num_coarse_docs
        return batch.append_column("coarse", pa.array(c, pa.int64()))

    def islands(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        st = group.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((st, doc))
        doc, st = doc[order], st[order]
        en = st + n
        # dense per-doc rank so ONE accumulate handles every doc: the
        # offset dominates any within-doc token position
        doc_rank = np.cumsum(np.r_[False, doc[1:] != doc[:-1]])
        OFF = np.int64(1) << 40
        adj_en = en + doc_rank * OFF
        run = np.maximum.accumulate(adj_en)
        brk = np.r_[True, (st[1:] + doc_rank[1:] * OFF) > run[:-1]]
        heads = np.flatnonzero(brk)
        span_end = np.maximum.reduceat(en, heads)
        return pa.table({
            "doc_id": pa.array(doc[heads], pa.int64()),
            "span_start": pa.array(st[heads], pa.int64()),
            "span_end": pa.array(span_end, pa.int64()),
        })

    occ = ds.map_batches(gram_occ, batch_format="pyarrow")
    hits = occ.groupby("coarse").map_groups(cross_doc_hits,
                                            batch_format="pyarrow")
    return (hits.map_batches(add_doc_coarse, batch_format="pyarrow")
                .groupby("coarse")
                .map_groups(islands, batch_format="pyarrow"))


def dedup_rate_report(sf_dir: str) -> "ray.data.Dataset":
    """Per-source duplication report (the dataset-card metric): doc count,
    distinct normalized fingerprints, duplicate count and rate.

    The vocab_growth shuffle shape with fp as the term: per-batch
    (source, fp) partial counts (combiner), ONE coarse shuffle hashed on
    fp so each bucket owns its fingerprints exactly, per-bucket per-source
    partials, a final sources-sized rollup.  NULL text fingerprints to a
    sentinel distinct class (mirrored by COALESCE in the twin) so null
    docs are neither dropped nor merged with empty-string docs."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _default_num_coarse
    from .text import fingerprint_batch

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        fp = pc.fill_null(fingerprint_batch(batch), "(null)")
        g = (pa.table({"source": batch.column("source"), "fp": fp})
             .group_by(["source", "fp"]).aggregate([([], "count_all")])
             .rename_columns(["source", "fp", "partial_c"]))
        coarse = _string_coarse_hash(
            g.column("fp").combine_chunks()
            if isinstance(g.column("fp"), pa.ChunkedArray)
            else g.column("fp"), nc)
        return g.append_column("__coarse", pa.array(coarse, pa.int64()))

    def bucket_partials(group: pa.Table) -> pa.Table:
        t = (group.select(["source", "fp", "partial_c"])
                  .group_by(["source", "fp"])
                  .aggregate([("partial_c", "sum")]))
        g = (t.group_by("source")
              .aggregate([("partial_c_sum", "sum"), ([], "count_all")]))
        return g.rename_columns(["source", "docs_p", "distinct_p"])

    def finish(batch: pa.Table) -> pa.Table:
        from ..functions.num import round6
        n = pc.cast(batch.column("n_docs"), pa.int64())
        d = pc.cast(batch.column("n_distinct"), pa.int64())
        dups = pc.subtract(n, d)
        return pa.table({
            "source": batch.column("source"),
            "n_docs": n, "n_distinct": d, "n_dups": dups,
            "dup_rate": round6(pc.divide(pc.cast(dups, pa.float64()),
                                         pc.cast(n, pa.float64()))),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__coarse")
              .map_groups(bucket_partials, batch_format="pyarrow")
              .groupby("source")
              .aggregate(Sum("docs_p", alias_name="n_docs"),
                         Sum("distinct_p", alias_name="n_distinct"))
              .map_batches(finish, batch_format="pyarrow"))


def cross_source_overlap(sf_dir: str, key: str = "term"
                         ) -> "ray.data.Dataset":
    """Cross-source overlap matrix: for every source pair, how many
    distinct keys appear in BOTH sources.  ``key="term"`` (default)
    measures vocabulary overlap (lowercased whitespace tokens — the
    domain-similarity dataset-card metric); ``key="fp"`` measures exact
    content contamination (normalized-text fingerprints — how many
    documents two ingestion feeds share; zero on corpora with no
    cross-feed dups).

    Scale shape: per-batch distinct (key, source) combiner -> ONE coarse
    shuffle hashed on key (each bucket owns its keys exactly) -> in-bucket
    segment scan emits source pairs for multi-source keys, VECTORIZED by
    grouping segments of equal source-count k (at most #sources distinct
    k values, so the Python loop is O(#sources), never O(keys)) -> a
    final pairs-sized rollup (<= #sources^2 rows).  Null-text docs carry
    no key in either mode, matching the twin's WHERE."""
    from ray.data.aggregate import Sum

    from ..functions.agg import _default_num_coarse
    from .text import fingerprint_batch

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        if key == "fp":
            k = fingerprint_batch(batch)
            t = pa.table({"key": k, "source": batch.column("source")})
            t = t.filter(pc.is_valid(t.column("key")))
        else:
            split = pc.utf8_split_whitespace(
                pc.utf8_lower(batch.column("text")))
            toks = pc.list_flatten(split)
            src_i = pc.list_parent_indices(split)
            t = pa.table({"key": toks,
                          "source": batch.column("source").take(src_i)})
            t = t.filter(pc.not_equal(t.column("key"), ""))
        g = t.group_by(["key", "source"]).aggregate([])
        ka = g.column("key")
        ka = ka.combine_chunks() if isinstance(ka, pa.ChunkedArray) else ka
        coarse = _string_coarse_hash(ka, nc)
        return g.append_column("__coarse", pa.array(coarse, pa.int64()))

    empty = pa.table({"source_a": pa.array([], pa.string()),
                      "source_b": pa.array([], pa.string()),
                      "partial_n": pa.array([], pa.int64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        t = group.select(["key", "source"]).group_by(["key", "source"]) \
            .aggregate([])
        t = t.take(pc.sort_indices(t, sort_keys=[("key", "ascending"),
                                                 ("source", "ascending")]))
        if t.num_rows == 0:
            return empty
        kv = t.column("key").to_pandas().to_numpy()
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        sizes = np.diff(np.r_[starts, len(kv)])
        src = t.column("source").to_pandas().to_numpy()
        a_parts, b_parts = [], []
        for k_sz in np.unique(sizes[sizes >= 2]):
            segs = starts[sizes == k_sz]               # all segments of size k
            ii, jj = np.triu_indices(int(k_sz), k=1)
            a_parts.append(src[(segs[:, None] + ii[None, :]).ravel()])
            b_parts.append(src[(segs[:, None] + jj[None, :]).ravel()])
        if not a_parts:
            return empty
        p = pa.table({"source_a": pa.array(np.concatenate(a_parts)),
                      "source_b": pa.array(np.concatenate(b_parts))})
        g = p.group_by(["source_a", "source_b"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source_a", "source_b", "partial_n"])

    partials = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby("__coarse")
                  .map_groups(bucket_pairs, batch_format="pyarrow")
                  .map_batches(lambda b: b if b.num_rows else empty,
                               batch_format="pyarrow"))
    return partials.groupby(["source_a", "source_b"]).aggregate(
        Sum("partial_n", alias_name="n_shared"))


def paragraph_dedup(sf_dir: str) -> "ray.data.Dataset":
    """C4-style paragraph-level exact dedup with reassembly: split every
    doc on newlines, keep only the FIRST occurrence corpus-wide of each
    exact paragraph (winner = min (doc_id, position)), and rebuild each
    doc's text from its surviving paragraphs.  Returns one row per doc:
    (doc_id, n_paras, n_kept, text_dedup) — text_dedup NULL when every
    paragraph of the doc was a duplicate (SQL string_agg semantics).

    Scale shape: vectorized explode (one split kernel + numpy repeat,
    no per-row loop), then exactly TWO coarse shuffles — one on the
    paragraph string (each paragraph's occurrences co-bucket, so the
    global winner is decided with a segment scan, no per-paragraph
    dispatch) and one on doc_id for reassembly (per-doc gather, linear
    in doc size, the same contract as SQL string_agg).  Paragraph text
    moves through each shuffle once; nothing corpus-sized touches the
    driver.  Docs with NULL text are dropped in both engines (SQL
    ``unnest(string_split(NULL))`` yields no rows)."""
    from ..functions.agg import _GOLDEN, _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        split = pc.split_pattern(
            batch.column("text").combine_chunks(), "\n")
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), lens)
        ends = np.cumsum(lens)
        ord1 = np.arange(int(ends[-1]) if len(ends) else 0,
                         dtype=np.int64) - np.repeat(ends - lens, lens) + 1
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "para_ord": pa.array(ord1, pa.int64()),
            "para": flat,
            "__coarse": pa.array(_string_coarse_hash(flat, nc), pa.int64()),
        })

    empty_flags = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "para_ord": pa.array([], pa.int64()),
        "para": pa.array([], pa.string()),
        "__dcoarse": pa.array([], pa.int64()),
    })

    def winners(group: pa.Table) -> pa.Table:
        """One paragraph-hash bucket: mark the global first occurrence of
        each distinct paragraph (sort brings equal paras adjacent; the
        segment head is the (doc_id, para_ord) minimum)."""
        if group.num_rows == 0:
            return empty_flags
        idx = pc.sort_indices(group, sort_keys=[
            ("para", "ascending"), ("doc_id", "ascending"),
            ("para_ord", "ascending")])
        g = group.take(idx)
        p = g.column("para").combine_chunks()
        neq = pc.not_equal(p.slice(1), p.slice(0, len(p) - 1)).to_numpy(
            zero_copy_only=False)
        keep = np.r_[True, neq]
        kept = g.filter(pa.array(keep))
        doc = kept.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": kept.column("doc_id"),
            "para_ord": kept.column("para_ord"),
            "para": kept.column("para"),
            "__dcoarse": pa.array((doc * _GOLDEN) % nc, pa.int64()),
        })

    kept_rows = (ds.map_batches(explode, batch_format="pyarrow")
                 .groupby("__coarse")
                 .map_groups(winners, batch_format="pyarrow"))

    empty_out = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_paras": pa.array([], pa.int64()),
        "n_kept": pa.array([], pa.int64()),
        "text_dedup": pa.array([], pa.large_string()),
    })

    def assemble(group: pa.Table) -> pa.Table:
        """One doc-hash bucket: rebuild each doc from its surviving
        paragraphs in original order; docs whose every paragraph was
        removed get NULL text (SQL string_agg over zero rows)."""
        if group.num_rows == 0:
            return empty_out
        idx = pc.sort_indices(group, sort_keys=[
            ("doc_id", "ascending"), ("para_ord", "ascending")])
        g = group.take(idx)
        doc = g.column("doc_id").to_numpy()
        is_kept = g.column("para_ord").is_valid().to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        bounds = np.r_[starts, len(doc)].astype(np.int64)
        # the totals row (NULL para_ord) sorts to each doc segment's END
        # (Arrow null_placement at_end) — read n_paras there
        n_paras = g.column("n_paras").to_numpy(
            zero_copy_only=False)[bounds[1:] - 1].astype(np.int64)
        kcum = np.r_[0, np.cumsum(is_kept)].astype(np.int64)
        kept_bounds = kcum[bounds]
        n_kept = np.diff(kept_bounds)
        paras = pc.cast(
            g.column("para").combine_chunks().filter(pa.array(is_kept)),
            pa.large_string())
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(kept_bounds, pa.int64()), paras),
            pa.scalar("\n", pa.large_string()))
        text = pc.if_else(pa.array(n_kept > 0), joined,
                          pa.scalar(None, pa.large_string()))
        return pa.table({
            "doc_id": pa.array(doc[starts], pa.int64()),
            "n_paras": pa.array(n_paras, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "text_dedup": text,
        })

    # totals rows (one per doc, no para) union'd with kept paragraph rows:
    # a PURE MAP over a second pruned read (n_paras = newline count + 1 —
    # no second explode, no aggregate, no extra shuffle); the totals row
    # also guarantees all-duplicate docs still emit an output row
    def tag_totals(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_paras = pc.add(
            pc.count_substring(batch.column("text"), "\n"), 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "para_ord": pa.nulls(len(doc), pa.int64()),
            "para": pa.nulls(len(doc), pa.string()),
            "n_paras": pc.cast(n_paras, pa.int64()),
            "__dcoarse": pa.array((doc * _GOLDEN) % nc, pa.int64()),
        })

    def tag_kept(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "para_ord": batch.column("para_ord"),
            "para": batch.column("para"),
            "n_paras": pa.nulls(batch.num_rows, pa.int64()),
            "__dcoarse": batch.column("__dcoarse"),
        })

    totals = sized_read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"]) \
        .map_batches(tag_totals, batch_format="pyarrow")
    unioned = totals.union(
        kept_rows.map_batches(tag_kept, batch_format="pyarrow"))
    return unioned.groupby("__dcoarse").map_groups(
        assemble, batch_format="pyarrow")


def doc_novelty(sf_dir: str, n: int = 8) -> "ray.data.Dataset":
    """Per-document n-gram novelty: the fraction of a doc's word
    ``n``-grams that appear in NO other document — the memorization-risk
    / boilerplate-content signal (novelty 1.0 = wholly original text,
    near 0 = assembled from shared fragments).  Emits (doc_id, n_grams,
    n_dup_grams, novelty) for every doc with at least one n-gram;
    dup grams are counted per INSTANCE (a doc repeating a shared gram
    is penalized each time).

    Scale shape: vectorized gram extraction (the shared _batch_ngrams
    kernel), per-batch (gram, doc, count) partials (docs never span
    batches, so counts are final), ONE gram-coarse shuffle — each
    bucket owns its grams fully, decides cross-doc duplication with a
    segment scan, and pre-reduces to per-doc partial sums — then a
    coarse doc rollup and a pure ratio map.  The twin's ratio division
    is the single float op (count ratios of exact ints)."""
    from ..functions.agg import _default_num_coarse, coarse_grouped_aggregate
    from ..functions.num import round6

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        grams, doc_rep, _pos = _batch_ngrams(batch.column("text"), n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "__coarse": pa.array([], pa.int64())})
        doc = batch.column("doc_id").take(pa.array(doc_rep, pa.int64()))
        g = pa.table({"gram": grams, "doc_id": doc}) \
            .group_by(["gram", "doc_id"]).aggregate([([], "count_all")]) \
            .rename_columns(["gram", "doc_id", "c"])
        ga = g.column("gram").combine_chunks()
        return g.append_column(
            "__coarse", pa.array(_string_coarse_hash(ga, nc), pa.int64()))

    def bucket_dup(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "partial_total": pa.array([], pa.int64()),
                          "partial_dup": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        # merge cross-batch duplicates of the same (gram, doc) pair first
        # (this bucket owns each gram fully), then one gram-segment scan:
        # a segment of >= 2 rows means >= 2 distinct docs share the gram
        t = group.select(["gram", "doc_id", "c"]) \
            .group_by(["gram", "doc_id"]).aggregate([("c", "sum")]) \
            .rename_columns(["gram", "doc_id", "c"])
        idx2 = pc.sort_indices(t, sort_keys=[("gram", "ascending")])
        t = t.take(idx2)
        ga2 = t.column("gram").combine_chunks()
        neq2 = pc.not_equal(ga2.slice(1), ga2.slice(0, len(ga2) - 1)) \
            .to_numpy(zero_copy_only=False)
        starts2 = np.flatnonzero(np.r_[True, neq2])
        sizes2 = np.diff(np.r_[starts2, len(ga2)])
        dup_gram = np.repeat(sizes2 >= 2, sizes2)
        c = t.column("c").to_numpy()
        out = pa.table({
            "doc_id": t.column("doc_id"),
            "partial_total": pa.array(c, pa.int64()),
            "partial_dup": pa.array(np.where(dup_gram, c, 0), pa.int64()),
        })
        agg = out.group_by("doc_id").aggregate(
            [("partial_total", "sum"), ("partial_dup", "sum")])
        return agg.rename_columns(["doc_id", "partial_total",
                                   "partial_dup"])

    per_doc = coarse_grouped_aggregate(
        ds.map_batches(gram_partial, batch_format="pyarrow")
          .groupby("__coarse")
          .map_groups(bucket_dup, batch_format="pyarrow"),
        "doc_id", [("partial_total", "sum", "n_grams"),
                   ("partial_dup", "sum", "n_dup_grams")])

    def finish(batch: pa.Table) -> pa.Table:
        total = batch.column("n_grams").to_numpy().astype(np.float64)
        dup = batch.column("n_dup_grams").to_numpy().astype(np.float64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": batch.column("n_grams"),
            "n_dup_grams": batch.column("n_dup_grams"),
            "novelty": round6(pa.array(1.0 - dup / total)),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow")


def dedup_cascade_report(sf_dir: str) -> "ray.data.Dataset":
    """Dedup-cascade attrition report: how many documents each tier of
    the dedup stack would touch — exact content duplicates, documents
    losing at least one paragraph to paragraph-level dedup, and MinHash
    near-duplicates — the dataset-card table that justifies which tiers
    a release actually runs.  Counts are per-tier document counts over
    the same corpus (tiers overlap by design; this is a report, not a
    pipeline).

    Scale shape: each tier is its own already-scale-shaped pipeline;
    the report reduces each to ONE scalar with a streaming aggregate
    (never materializing tier outputs on the driver)."""
    from ray.data.aggregate import Sum

    n_docs = sized_read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).count()

    # exact: duplicate docs = group sizes beyond the kept one
    def exact_extra(batch: pa.Table) -> pa.Table:
        extra = pc.subtract(batch.column("n"), 1)
        return pa.table({"x": pa.array(
            [pc.sum(extra).as_py() or 0], pa.int64())})

    exact_dups = (exact_dedup(sf_dir)
                  .map_batches(exact_extra, batch_format="pyarrow")
                  .sum("x") or 0)

    # paragraph: docs that would lose at least one paragraph
    def para_hit(batch: pa.Table) -> pa.Table:
        hit = pc.less(batch.column("n_kept"), batch.column("n_paras"))
        return pa.table({"x": pa.array(
            [pc.sum(pc.cast(hit, pa.int64())).as_py() or 0], pa.int64())})

    para_docs = (paragraph_dedup(sf_dir)
                 .map_batches(para_hit, batch_format="pyarrow")
                 .sum("x") or 0)

    # minhash: distinct near-duplicate docs (dup side of verified pairs)
    def mh_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"d": pc.unique(batch.column("dup_id"))})

    mh = minhash_dedup(sf_dir)
    mh_docs = (mh.map_batches(mh_ids, batch_format="pyarrow")
               .groupby("d").count().count())

    return ray.data.from_arrow(pa.table({
        "tier": pa.array(["exact_duplicate", "paragraph_affected",
                          "minhash_near_dup"], pa.string()),
        "n_docs": pa.array([int(exact_dups), int(para_docs),
                            int(mh_docs)], pa.int64()),
        "corpus_docs": pa.array([n_docs] * 3, pa.int64()),
    }))


# ---------------------------------------------------------------------------
# Content-defined chunking (FastCDC/gear-hash family): chunk boundaries
# follow CONTENT, so an insertion early in a document shifts no later
# chunk — the storage/dedup property fixed-size chunking lacks.
# ---------------------------------------------------------------------------

# deterministic 256-entry gear table (splitmix64 over the byte value)
def _gear_table() -> np.ndarray:
    x = np.arange(256, dtype=np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_GEAR = _gear_table()


def cdc_boundaries(data: bytes, min_size: int = 16, avg_bits: int = 6,
                   max_size: int = 256) -> List[int]:
    """Chunk END offsets (exclusive; last == len(data)) under gear-CDC:
    a CANDIDATE cut after byte i when the low ``avg_bits`` bits of the
    gear hash are zero there (expected chunk ~2^avg_bits bytes); a cut is
    taken when >= ``min_size`` bytes since the last cut, and a cut is
    FORCED every ``max_size`` bytes regardless.

    Vectorized on the observation that the gear recurrence
    ``h = (h << 1) + gear[b]`` leaves the low m bits depending on only
    the last m bytes: candidates are m shifted adds in numpy; the
    sequential min/max walk touches only the ~n/2^m candidates."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[arr]
    m = avg_bits
    low = g.copy()
    for k in range(1, m):
        low[k:] += g[:-k] << np.uint64(k)
    cand = np.flatnonzero((low & np.uint64((1 << m) - 1)) == 0) + 1
    cuts, last = [], 0
    for c in cand:
        while c - last > max_size:           # forced cuts in the gap
            last += max_size
            cuts.append(last)
        if c - last >= min_size:
            cuts.append(int(c))
            last = int(c)
    while n - last > max_size:
        last += max_size
        cuts.append(last)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts


def _doc_chunk_hashes(text: str, **kw) -> np.ndarray:
    """crc32 fingerprint per CDC chunk of the utf-8 text."""
    data = text.encode("utf-8")
    out, start = [], 0
    for end in cdc_boundaries(data, **kw):
        out.append(zlib.crc32(data[start:end]))
        start = end
    return np.asarray(out, dtype=np.int64)


def cdc_chunk_stats(sf_dir: str, min_size: int = 16, avg_bits: int = 6,
                    max_size: int = 256) -> "ray.data.Dataset":
    """Per-doc CDC chunking profile: (doc_id, n_chunks, avg_chunk_len
    6dp; NULL text = 0 chunks, NULL avg).  Pure map, no shuffle."""
    from ..functions.num import round6
    from .text import _read_docs

    def stats(batch: pa.Table) -> pa.Table:
        n_chunks, total = [], []
        for t in batch.column("text").to_pylist():
            b = (t or "").encode("utf-8")
            cuts = cdc_boundaries(b, min_size, avg_bits, max_size)
            n_chunks.append(len(cuts))
            total.append(len(b))
        n = np.asarray(n_chunks, dtype=np.int64)
        avg = pc.if_else(
            pa.array(n > 0),
            round6(pa.array(np.asarray(total, dtype=np.float64)
                            / np.maximum(n, 1))),
            pa.scalar(None, pa.float64()))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_chunks": pa.array(n, pa.int64()),
                         "avg_chunk_len": avg})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow")


def cdc_dedup_stats(sf_dir: str, min_size: int = 16, avg_bits: int = 6,
                    max_size: int = 256) -> "ray.data.Dataset":
    """Corpus-level CDC dedup yield: how many content-defined chunks are
    SHARED across documents (the storage-dedup estimate; one row:
    total_chunks, distinct_chunks, shared_chunks = distinct hashes seen
    in >= 2 docs, dup_ratio = 1 - distinct/total, 6dp).

    Scale shape: per-batch (chunk_hash -> n_occurrences, n_docs-partial)
    histograms feed ONE hash-keyed coarse shuffle (a chunk hash repeated
    within a doc counts every occurrence toward total but its doc once
    toward n_docs — per-batch distinct is exact because a doc lives in
    one batch); the final reduce is a streaming aggregate over the
    chunk-hash table, never a driver pull."""
    from ray.data.aggregate import Sum

    from ..functions.agg import coarse_grouped_aggregate
    from ..functions.num import round6
    from .text import _read_docs

    def partial(batch: pa.Table) -> pa.Table:
        hs, docs = [], []
        for i, t in enumerate(batch.column("text").to_pylist()):
            h = _doc_chunk_hashes(t or "", min_size=min_size,
                                  avg_bits=avg_bits, max_size=max_size)
            hs.append(h)
            docs.append(np.full(len(h), i, dtype=np.int64))
        if not hs:
            return pa.table({"h": pa.array([], pa.int64()),
                             "p_occ": pa.array([], pa.int64()),
                             "p_docs": pa.array([], pa.int64())})
        h = np.concatenate(hs)
        d = np.concatenate(docs)
        t = pa.table({"h": pa.array(h), "d": pa.array(d)})
        occ = t.group_by("h").aggregate([([], "count_all"),
                                         ("d", "count_distinct")])
        return occ.rename_columns(["h", "p_occ", "p_docs"])

    per_hash = coarse_grouped_aggregate(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        "h", [("p_occ", "sum", "n_occ"), ("p_docs", "sum", "n_docs")])

    def reduce_partial(batch: pa.Table) -> pa.Table:
        occ = batch.column("n_occ").to_numpy()
        nd = batch.column("n_docs").to_numpy()
        return pa.table({
            "total_chunks": pa.array([int(occ.sum())], pa.int64()),
            "distinct_chunks": pa.array([batch.num_rows], pa.int64()),
            "shared_chunks": pa.array([int((nd >= 2).sum())], pa.int64()),
        })

    agg = per_hash.map_batches(reduce_partial, batch_format="pyarrow") \
        .aggregate(Sum("total_chunks", alias_name="total_chunks"),
                   Sum("distinct_chunks", alias_name="distinct_chunks"),
                   Sum("shared_chunks", alias_name="shared_chunks")) or {}
    total = int(agg.get("total_chunks") or 0)
    distinct = int(agg.get("distinct_chunks") or 0)
    shared = int(agg.get("shared_chunks") or 0)
    ratio = round(1.0 - distinct / total, 6) if total else None
    return ray.data.from_arrow(pa.table({
        "total_chunks": pa.array([total], pa.int64()),
        "distinct_chunks": pa.array([distinct], pa.int64()),
        "shared_chunks": pa.array([shared], pa.int64()),
        "dup_ratio": pa.array([ratio], pa.float64()),
    }))


def line_dedup_intra(sf_dir: str) -> "ray.data.Dataset":
    """RefinedWeb-style WITHIN-document line dedup: split every doc on
    newlines, keep only the FIRST occurrence of each exact line inside
    that same document, and rebuild the doc's text from the survivors in
    original order.  Returns one row per non-NULL-text doc: (doc_id,
    n_lines, n_kept, text_dedup).  Complements ``paragraph_dedup`` (the
    corpus-WIDE variant): intra-doc dedup needs no cross-doc state, so
    where paragraph_dedup pays two coarse shuffles this is a PURE MAP —
    at 100 TB it streams block-by-block with zero exchange.

    Vectorized shape: one split kernel, a (doc, line, pos) lexsort per
    batch to mark first-of-run (explicit ``pos`` tie-break — no reliance
    on sort stability), scatter back to input order, then bincount +
    offsets-based ``binary_join`` reassembly.  No per-row loop.

    Null contract: NULL-text docs drop (SQL ``unnest`` over a NULL split
    emits no rows, so the twin's GROUP BY never sees them); empty text is
    one empty line, kept (n_lines = n_kept = 1).
    """
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    empty_out = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_lines": pa.array([], pa.int64()),
        "n_kept": pa.array([], pa.int64()),
        "text_dedup": pa.array([], pa.large_string()),
    })

    def dedup_lines(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        n = batch.num_rows
        if n == 0:
            return empty_out
        split = pc.split_pattern(
            batch.column("text").combine_chunks(), "\n")
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        drow = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64)
        order = pc.sort_indices(
            pa.table({"d": pa.array(drow), "line": flat,
                      "pos": pa.array(pos)}),
            sort_keys=[("d", "ascending"), ("line", "ascending"),
                       ("pos", "ascending")]).to_numpy()
        d_s = drow[order]
        line_s = flat.take(pa.array(order))
        if total > 1:
            neq = pc.not_equal(
                line_s.slice(1), line_s.slice(0, total - 1)).to_numpy(
                zero_copy_only=False)
            first_sorted = np.r_[True, (d_s[1:] != d_s[:-1]) | neq]
        else:
            first_sorted = np.ones(total, dtype=bool)
        keep = np.zeros(total, dtype=bool)
        keep[order] = first_sorted
        n_kept = np.bincount(drow[keep], minlength=n).astype(np.int64)
        kept_lines = pc.cast(flat.filter(pa.array(keep)),
                             pa.large_string())
        bounds = np.r_[0, np.cumsum(n_kept)].astype(np.int64)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(bounds, pa.int64()),
                                          kept_lines),
            pa.scalar("\n", pa.large_string()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_lines": pa.array(lens, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "text_dedup": joined,
        })

    return ds.map_batches(dedup_lines, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Prefix-filter exact similarity join (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

def prefix_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                         shingle_k: int = 3,
                         table: str = "documents") -> "ray.data.Dataset":
    """EXACT all-pairs word-shingle Jaccard join via PREFIX FILTERING
    (the AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al.
    2008): the deterministic, no-missed-pairs counterpart of
    ``minhash_dedup``'s probabilistic LSH, with the same verified-pair
    output contract (doc_a < doc_b, exact Jaccard >= threshold).

    Why it is complete: fix any total order over shingles.  If
    J(s,t) >= τ then the overlap i >= ceil(τ·|s|) (since i >= τ(|s|+|t|−i)
    and |t| >= i), so the smallest SHARED shingle cannot sit deeper than
    position |s| − i + 1 <= |s| − ceil(τ·|s|) + 1 in either set — i.e.
    the two PREFIXES of that length share a token.  Emitting only prefix
    tokens as index rows therefore generates every qualifying pair.

    Scale shape: one doc scan emits (prefix_token, doc, |s|) index rows
    (~(1−τ) of each doc's shingles); ONE coarse token-hashed shuffle
    emits in-bucket candidate pairs (all pairs per token segment, pruned
    by the |t| >= τ·|s| length filter); verification reuses the shared
    membership-union primitive — corpus text ships through exactly one
    hash shuffle, exact Jaccard per candidate, nothing on the driver.
    The total order here is shingle-hash order (ties by string): an
    unbiased stand-in for PPJoin's document-frequency-ascending order —
    that optimization needs a DF pass; hash order keeps buckets small on
    natural text because shingles are mostly rare.  A pathological
    boilerplate shingle that lands in many prefixes degrades to a
    quadratic bucket — the DF-ordered variant is the documented fix at
    that regime."""
    import math

    from ..functions.pairs import verify_candidate_pairs

    path = f"{sf_dir}/{table}.parquet"
    ds = sized_read_parquet(path, columns=["doc_id", "text"])
    n_docs = ds.count()
    nc = _num_coarse(n_docs * 4)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t, out_id, out_sz = [], [], []
        for doc_id, text in zip(ids, texts):
            sh = word_shingles(text, shingle_k)
            if not sh:
                continue                 # null/empty text: never a candidate
            size = len(sh)
            # epsilon guards the float ceil from rounding UP past the
            # exact value (a too-short prefix would break completeness;
            # one token longer only adds candidates)
            plen = size - math.ceil(threshold * size - 1e-9) + 1
            ordered = sorted(sh, key=lambda s: (zlib.crc32(s.encode()), s))
            for tok in ordered[:plen]:
                out_t.append(tok)
                out_id.append(doc_id)
                out_sz.append(size)
        tok = pa.array(out_t, pa.string())
        h = np.array([zlib.crc32(t.encode()) for t in out_t],
                     dtype=np.uint64)
        mixed = (h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
        coarse = pc.cast(pa.array(mixed % np.uint64(nc)), pa.int64())
        return pa.table({"coarse": coarse, "token": tok,
                         "doc_id": pa.array(out_id, pa.int64()),
                         "size": pa.array(out_sz, pa.int64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        tok = group.column("token").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sz = group.column("size").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tok))
        tok, ids, sz = tok[order], ids[order], sz[order]
        new_seg = np.r_[True, tok[1:] != tok[:-1]]
        bounds = np.r_[np.flatnonzero(new_seg), len(tok)]
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            seg_ids, seg_sz = ids[s:e], sz[s:e]
            iu, ju = np.triu_indices(m, k=1)
            a, b = seg_ids[iu], seg_ids[ju]
            sa, sb = seg_sz[iu], seg_sz[ju]
            # length filter: J >= τ needs min(|s|,|t|) >= τ·max(|s|,|t|)
            keep = (np.minimum(sa, sb)
                    >= threshold * np.maximum(sa, sb) - 1e-9) & (a != b)
            lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
            out_a.append(lo)
            out_b.append(hi)
        if out_a:
            aa = np.concatenate(out_a)
            bb = np.concatenate(out_b)
        else:
            aa = bb = np.array([], dtype=np.int64)
        return pa.table({"doc_a": pa.array(aa, pa.int64()),
                         "doc_b": pa.array(bb, pa.int64())})

    cand = (ds.map_batches(prefix_rows, batch_format="pyarrow")
              .groupby("coarse")
              .map_groups(bucket_pairs, batch_format="pyarrow"))
    num_coarse = _num_coarse(n_docs)

    def verify(a_ids, b_ids, texts_a, texts_b) -> pa.Table:
        ta, tb = texts_a.to_pylist(), texts_b.to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(len(a_ids)):
            j = jaccard(ta[i], tb[i], shingle_k)
            if j >= threshold:
                out_a.append(a_ids[i])
                out_b.append(b_ids[i])
                out_j.append(j)
        from ..functions.num import round6
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard": round6(pa.array(out_j, pa.float64()))})

    return verify_candidate_pairs(
        ds, cand, id_col="doc_id", payload_col="text",
        payload_type=pa.string(), num_coarse=num_coarse, verify=verify,
        a_col="doc_a", b_col="doc_b")


def minhash_estimation_error(sf_dir: str, num_perm: int = 64,
                             bands: int = 16, shingle_k: int = 3,
                             table: str = "documents") -> "ray.data.Dataset":
    """Estimator-quality evaluation for the MinHash tier: for every LSH
    candidate pair, the MinHash-ESTIMATED Jaccard (matching signature
    components / num_perm) next to the EXACT word-shingle Jaccard and the
    absolute error — the report that tells you whether num_perm/bands are
    sized right for the corpus before you trust the dedup tier at 100 TB
    (E[est] = true Jaccard; sd ~ sqrt(J(1-J)/num_perm)).

    One row per distinct candidate pair (keep_id < dup_id; band-duplicate
    candidates dedupe inside the shared verification primitive).

    Scale shape: identical to minhash_dedup — ONE corpus-payload hash
    shuffle + candidate-sized coarse groupbys via
    ``functions.pairs.verify_candidate_pairs``; nothing reaches the
    driver.  SQL twin: the minhash_dedup crc32/signature replay plus a
    per-pair component-match join over the signature table.  The signatures are recomputed from the pair payloads inside
    the verify kernel (deterministic — same hash family as the banding
    pass); the 100 TB variant ships struct(text, signature) payloads
    through the same primitive to avoid the recompute."""
    from ..functions.pairs import verify_candidate_pairs

    path = f"{sf_dir}/{table}.parquet"
    ds = sized_read_parquet(path, columns=["doc_id", "text"])
    cand = _candidate_pairs_ds(ds, "text", "doc_id", num_perm, bands,
                               shingle_k)
    num_coarse = _num_coarse(ds.count())
    a_p, b_p = _perm_params(num_perm)

    def verify(keep_ids, dup_ids, texts_a, texts_b) -> pa.Table:
        from ..functions.num import round6
        ta, tb = texts_a.to_pylist(), texts_b.to_pylist()
        est = np.empty(len(keep_ids), np.float64)
        exact = np.empty(len(keep_ids), np.float64)
        for i in range(len(keep_ids)):
            sa = minhash_signature(ta[i], a_p, b_p, shingle_k)
            sb = minhash_signature(tb[i], a_p, b_p, shingle_k)
            est[i] = (sa == sb).mean()
            exact[i] = jaccard(ta[i], tb[i], shingle_k)
        # round6 (scale-multiply, twin-parity), not np.round (half-even
        # correctly-rounded decimal — one ulp away on some ratios)
        est_a = round6(pa.array(est, pa.float64()))
        exact_a = round6(pa.array(exact, pa.float64()))
        err_a = round6(pc.abs(pc.subtract(est_a, exact_a)))
        return pa.table({
            "keep_id": pa.array(keep_ids, pa.int64()),
            "dup_id": pa.array(dup_ids, pa.int64()),
            "est_jaccard": est_a,
            "exact_jaccard": exact_a,
            "abs_err": err_a,
        })

    return verify_candidate_pairs(
        ds, cand, id_col="doc_id", payload_col="text",
        payload_type=pa.string(), num_coarse=num_coarse, verify=verify,
        a_col="keep_id", b_col="dup_id")


def sorted_neighborhood_pairs(sf_dir: str, key_len: int = 12,
                              block_len: int = 4,
                              window: int = 3) -> "ray.data.Dataset":
    """Sorted-neighborhood blocking (the merge/purge candidate generator):
    documents sort by a normalized-prefix key and every doc pairs with
    the next ``window - 1`` docs in that order — the classic cheap
    candidate stage an entity-resolution / near-dup pipeline runs before
    expensive pairwise verification.

    Key = first ``key_len`` chars of lower(trim(ws-collapsed text)) (the
    fingerprint normalization); pairs never cross a ``block_len``-char
    blocking prefix (standard SNM blocking — that contract is what makes
    the op shuffle-bounded).  Emits (block, doc_a, doc_b, same_key) with
    doc_a < doc_b order within the sorted run; NULL text drops.

    Scale shape: normalization + prefix slicing are vectorized kernels in
    the map; ONE coarse shuffle on hash(block) co-locates each block
    (pairs need only block-local order), and the in-bucket pass is a
    single lexsort + shifted-comparison — no per-block dispatch, no pair
    explosion beyond the window."""
    from ..functions.agg import _default_num_coarse

    nc = _default_num_coarse()
    ds = sized_read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    empty = pa.table({
        "block": pa.array([], pa.string()),
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "same_key": pa.array([], pa.bool_()),
    })

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        if batch.num_rows == 0:
            return pa.table({"block": pa.array([], pa.string()),
                             "key": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "__coarse": pa.array([], pa.int64())})
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(batch.column("text")), r"\s+", " "))
        key = pc.utf8_slice_codeunits(norm, 0, key_len)
        block = pc.utf8_slice_codeunits(norm, 0, block_len)
        coarse = _string_coarse_hash(
            block.combine_chunks() if isinstance(block, pa.ChunkedArray)
            else block, nc)
        return pa.table({"block": block, "key": key,
                         "doc_id": batch.column("doc_id"),
                         "__coarse": pa.array(coarse, pa.int64())})

    def bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("block", "ascending"), ("key", "ascending"),
            ("doc_id", "ascending")]))
        blocks = g.column("block").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy()
        outs = []
        for off in range(1, window):
            if len(ids) <= off:
                break
            same_block = blocks[:-off] == blocks[off:]
            if not same_block.any():
                continue
            outs.append(pa.table({
                "block": pa.array(blocks[:-off][same_block], pa.string()),
                "doc_a": pa.array(ids[:-off][same_block]),
                "doc_b": pa.array(ids[off:][same_block]),
                "same_key": pa.array(keys[:-off][same_block]
                                     == keys[off:][same_block]),
            }))
        return pa.concat_tables(outs) if outs else empty

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("__coarse")
            .map_groups(bucket, batch_format="pyarrow")
            .map_batches(lambda b: b if b.num_rows else empty,
                         batch_format="pyarrow"))
