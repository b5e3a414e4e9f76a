"""Multimodal pipelines over the binary media table.

Each pipeline is read_parquet -> map_batches stages from stages/media.py,
run in TASK mode (``task_stage``: per-process cached instances) because the
sandbox's fake codec backends are stateless — a weights-loading backend
would switch back to the actor-pool classes unchanged.  Payload bytes
dominate block size, so every stage runs with a small ``batch_size`` and
drops the payload column as soon as it has been consumed (the "never carry
images past the stage that needs them" rule, SURVEY.md §7).

These are non-SQL queries (payload synthesis/decoding has no DuckDB twin);
the driver records rows-only checks, and tests/test_multimodal.py pins the
determinism + schema contracts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.media import media_table_path
from ..stages.media import (FrameSampleStage, ImagePreprocessStage,
                            ImageResizeStage, MediaDecodeStage,
                            MediaFeatureStage, ResizeLongestSideStage,
                            task_stage)

_BATCH = 32          # payload rows per batch: binary-heavy, keep small


def _read_media(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(media_table_path(sf_dir),
                                 columns=["media_id", "payload"])


def media_decode_summary(sf_dir: str) -> "ray.data.Dataset":
    """Decode every payload -> (media_id, kind, dims, content_crc)."""
    return _read_media(sf_dir).map_batches(
        task_stage(MediaDecodeStage), batch_size=_BATCH,
        batch_format="pyarrow")


def image_thumbnails(sf_dir: str) -> "ray.data.Dataset":
    """Images resized to 64x64 thumbnails -> (media_id, dims, thumb crc)."""
    ds = _read_media(sf_dir).map_batches(
        task_stage(ImageResizeStage, out_width=64, out_height=64),
        batch_size=_BATCH, batch_format="pyarrow")

    def crc(batch: pa.Table) -> pa.Table:
        import zlib
        batch = batch.filter(batch.column("resized"))
        crcs = [zlib.crc32(t) for t in batch.column("thumbnail").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "thumb_crc": pa.array(crcs, pa.uint32()),
        })

    return ds.map_batches(crc, batch_format="pyarrow")


def video_frame_sample(sf_dir: str, every_n: int = 4) -> "ray.data.Dataset":
    """Videos exploded to every-Nth-frame rows, then decoded as images —
    demonstrates frame containers composing with the image stage chain."""
    frames = _read_media(sf_dir).map_batches(
        task_stage(FrameSampleStage, every_n=every_n),
        batch_size=_BATCH, batch_format="pyarrow")
    return frames.map_batches(
        task_stage(MediaDecodeStage), batch_size=_BATCH,
        batch_format="pyarrow")


def ocr_preprocess_summary(sf_dir: str, inv: bool = False,
                           binarize: bool = True) -> "ray.data.Dataset":
    """P11: the reference's OCR image-preprocess chain (alpha-to-color,
    optional invert, Otsu binarize — paddle_ocr.py:340-346) over every image
    payload, emitting per-image preprocessed digests."""
    return _read_media(sf_dir).map_batches(
        task_stage(ImagePreprocessStage, inv=inv, binarize=binarize),
        batch_size=_BATCH, batch_format="pyarrow")


def resize_longest_side(sf_dir: str, img_size: int = 1280) -> "ray.data.Dataset":
    """M7/P17: aspect-preserving model-input resize (longest side to
    img_size, reference int-truncation geometry) over every image payload.

    The upscale is the heaviest per-row media stage and it is MEMORY
    BANDWIDTH bound, not FLOP bound (16 plain processes only reach ~4x
    aggregate over serial on a 32-logical-CPU host).  Two scheduling
    choices follow:
    * re-block the read — task granularity is per block, so a
      handful-of-files media table would otherwise run len(files) tasks;
    * reserve ``num_cpus=2`` per task so co-scheduled SMT siblings don't
      fight for the same memory pipes (measured 13 s -> 4.7 s at 32
      logical CPUs on sf0.1; same trick as the padded scaling run's
      rationale in BASELINE.md)."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    ds = _read_media(sf_dir).repartition(max(2 * cpus, 16))
    return ds.map_batches(
        task_stage(ResizeLongestSideStage, img_size=img_size),
        batch_size=_BATCH, batch_format="pyarrow",
        # floor at the node size so a 1-CPU session can still schedule
        num_cpus=min(2, max(cpus, 1)))


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Feature vectors (list<float32>, dim 8) for every media item."""
    return _read_media(sf_dir).map_batches(
        task_stage(MediaFeatureStage), batch_size=_BATCH,
        batch_format="pyarrow")


# LSH near-dup tuning.  band_bits=16 gives 65,536 buckets per band (the
# round-2 six-bit space — 64 buckets — went quadratic at 10^9 items); the
# population cap bounds the in-bucket all-pairs scan, with oversized buckets
# split by dedicated refinement sign-bits (the simhash _SIMHASH_BUCKET_CAP
# pattern, dedup.py).
_MFND_BANDS = 8
_MFND_BAND_BITS = 16
_MFND_SUB_BITS = 16          # refinement hyperplanes for cap-splitting
_MFND_BUCKET_CAP = 512

def _segment_candidates(ids, sub, cap=_MFND_BUCKET_CAP):
    """Candidate (a, b) pairs within one (band, bucket) segment, population-
    capped.

    ``ids`` ascending, unique; ``sub`` the refinement sign-bits per id.
    Segments <= cap emit all a<b pairs vectorized.  Oversized segments are
    split by refinement bits 4 at a time (each split multiplies the band's
    effective width; true near-dups at the target threshold agree on the
    extra hyperplanes with high probability, and misses in this band are
    caught by the other bands).  A segment still > cap after all
    refinement bits is a dense near-identical cluster (its members agree
    on every hyperplane, so no sign bit can split it) — it emits STAR
    pairs against the segment-minimum id PLUS CHAIN pairs between
    id-consecutive members, keeping output linear (2(n-1) edges).  The
    contract in this regime is duplicate-CLUSTER connectivity, not the
    full O(n^2) pair list (which no sub-quadratic algorithm could emit);
    the chain edges keep exact duplicates with nearby ids directly linked
    even when the cluster representative is only near-identical to them
    and the star edge fails exact verification."""
    import numpy as np
    out_a, out_b = [], []

    def emit_all(idx):
        ii, jj = np.triu_indices(len(idx), k=1)
        out_a.append(ids[idx][ii])
        out_b.append(ids[idx][jj])

    def rec(idx, bits_used):
        n = len(idx)
        if n < 2:
            return
        if n <= cap:
            emit_all(idx)
        elif bits_used >= _MFND_SUB_BITS:
            out_a.append(np.full(n - 1, ids[idx[0]], dtype=np.int64))
            out_b.append(ids[idx[1:]])
            out_a.append(ids[idx[1:-1]])      # chain: consecutive members
            out_b.append(ids[idx[2:]])
        else:
            nibble = (sub[idx] >> bits_used) & 0xF
            order = np.argsort(nibble, kind="stable")
            sk = nibble[order]
            bounds = np.r_[np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]]),
                           len(sk)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                rec(idx[order[s:e]], bits_used + 4)

    rec(np.arange(len(ids)), 0)
    if not out_a:
        z = np.array([], dtype=np.int64)
        return z, z
    return np.concatenate(out_a), np.concatenate(out_b)


def media_feature_neardup(sf_dir: str, threshold: float = 0.999,
                          n_bands: int = _MFND_BANDS,
                          band_bits: int = _MFND_BAND_BITS) -> "ray.data.Dataset":
    """Embedding-cosine near-dup over extracted media features, distributed
    end-to-end via random-hyperplane LSH with the scale-safe round-3 shape:

    * **wide bands** — 8 bands x 16 sign-bits (65,536 buckets/band; the
      round-2 64-bucket space collapsed at 10^9 items).  Recall: a pair at
      cosine >= 0.999 disagrees per hyperplane with p = acos(.999)/pi ≈
      0.0143, so P(band match) = (1-p)^16 ≈ 0.79 and P(miss all 8 bands)
      ≈ 3e-6.
    * **population cap** — buckets > 512 members split by 16 dedicated
      refinement sign-bits, 4 at a time (see _segment_candidates), so the
      in-bucket pair scan can never go quadratic; residual
      indistinguishable cliques emit linear star pairs.
    * **no feature replication** — the bucket shuffle moves only
      (band, bucket, sub, media_id) int rows.  Feature vectors ship ONCE:
      candidate pairs explode to per-side membership rows, union with the
      (media_id, features) table, one hash shuffle on member_id attaches
      each side's vector, and a candidate-sized groupby((a, b)) computes
      the exact cosine — the minhash_dedup membership-union semi-join
      shape (dedup.py:256).

    Driver memory stays flat at any corpus size; nothing is materialized
    on the driver (the features table is materialized once in the object
    store — 8 floats/row, ~1000x smaller than payloads — because both the
    bucketize pass and the verification union consume it)."""
    import numpy as np

    from ..stages.media import MediaFeatureStage

    rng = np.random.RandomState(17)
    planes = rng.randn(n_bands * band_bits + _MFND_SUB_BITS,
                       MediaFeatureStage.DIM)
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(band_bits, dtype=np.int64))
    sub_weights = (1 << np.arange(_MFND_SUB_BITS, dtype=np.int64))

    feats = media_features(sf_dir).materialize()
    # SHUFFLE-AWARE re-blocking: the actor-pool feature stage emits one
    # block per ~32-row payload batch (60 blocks for a 2k-item table), and
    # the three downstream sorts inherit that as their partition count —
    # each partition carrying ~50-100 ms fixed scheduling cost.  The
    # feature table is 1000x smaller than the payloads (8 floats/row), so
    # re-block it by DATA SIZE via the shared block-count policy; at 10^9
    # items the byte term dominates and the count grows naturally.
    from ..functions.joins import target_num_blocks
    target_blocks = target_num_blocks(feats.size_bytes())
    if target_blocks < feats.num_blocks():
        feats = feats.repartition(target_blocks).materialize()
    from ..pipelines.dedup import _num_coarse
    num_coarse = _num_coarse(feats.count() * n_bands)

    def bucketize(batch: pa.Table) -> pa.Table:
        empty = pa.table({"coarse": pa.array([], pa.int64()),
                          "band": pa.array([], pa.int32()),
                          "bucket": pa.array([], pa.int64()),
                          "sub": pa.array([], pa.int64()),
                          "media_id": pa.array([], pa.int64())})
        if batch.num_rows == 0:          # empty block: norm() would raise
            return empty
        R = ray.get(planes_ref)
        ids = batch.column("media_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f = batch.column("features")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        mat = pc.list_flatten(f).to_numpy() \
            .reshape(len(ids), -1).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        bits = (mat @ R.T) > 0           # (n, n_bands*band_bits + sub_bits)
        band_part = bits[:, :n_bands * band_bits] \
            .reshape(len(ids), n_bands, band_bits)
        buckets = (band_part * weights[None, None, :]).sum(axis=2)
        sub = (bits[:, n_bands * band_bits:] * sub_weights[None, :]).sum(axis=1)
        band_ids = np.tile(np.arange(n_bands, dtype=np.int64), len(ids))
        flat_buckets = buckets.ravel()
        coarse = (band_ids * np.int64(0x9E3779B1) + flat_buckets) % num_coarse
        return pa.table({
            "coarse": pa.array(coarse, pa.int64()),
            "band": pa.array(band_ids.astype(np.int32), pa.int32()),
            "bucket": pa.array(flat_buckets, pa.int64()),
            "sub": pa.array(np.repeat(sub, n_bands), pa.int64()),
            "media_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
        })

    def coarse_candidates(group: pa.Table) -> pa.Table:
        """All (band, bucket) segments hashed into this coarse group,
        candidate-pair-emitted via the capped scan."""
        band = group.column("band").to_numpy()
        bucket = group.column("bucket").to_numpy()
        ids = group.column("media_id").to_numpy()
        sub = group.column("sub").to_numpy()
        order = np.lexsort((ids, bucket, band))
        band, bucket, ids, sub = (band[order], bucket[order],
                                  ids[order], sub[order])
        new_seg = np.r_[True, (band[1:] != band[:-1])
                        | (bucket[1:] != bucket[:-1])]
        bounds = np.r_[np.flatnonzero(new_seg), len(ids)]
        outs_a, outs_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b = _segment_candidates(ids[s:e], sub[s:e])
            outs_a.append(a)
            outs_b.append(b)
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(outs_a), pa.int64()),
                         "b": pa.array(np.concatenate(outs_b), pa.int64())})

    def verify(a_ids, b_ids, feats_a, feats_b) -> pa.Table:
        """Exact cosine per complete pair, one vectorized pass over the
        pair-aligned sides."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not len(a_ids):
            return empty
        va = pc.list_flatten(feats_a).to_numpy() \
            .reshape(len(a_ids), -1).astype(np.float64)
        vb = pc.list_flatten(feats_b).to_numpy() \
            .reshape(len(b_ids), -1).astype(np.float64)
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        denom = na * nb
        # zero-norm side -> score 0 (never a near-dup): a zero vector
        # LSH-collides with anything whose band dots are all non-positive,
        # and scoring those pairs 1.0 would emit false duplicates
        score = np.where(denom > 0, (va * vb).sum(axis=1) / np.where(
            denom > 0, denom, 1.0), 0.0)
        hit = score >= threshold
        return pa.table({"a": pa.array(a_ids[hit], pa.int64()),
                         "b": pa.array(b_ids[hit], pa.int64()),
                         "score": pa.array(score[hit], pa.float64())})

    cand = (feats.map_batches(bucketize, batch_format="pyarrow")
                 .groupby("coarse")
                 .map_groups(coarse_candidates, batch_format="pyarrow"))
    # verification: the shared membership-union semi-join (features ship
    # ONCE through one hash shuffle, never replicated per band); both
    # groupbys inside are coarse-bucketed so group bodies stay vectorized
    from ..functions.pairs import verify_candidate_pairs
    return verify_candidate_pairs(
        feats, cand, id_col="media_id", payload_col="features",
        payload_type=pa.list_(pa.float32()), num_coarse=num_coarse,
        verify=verify)


def media_exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact payload dedup over the media table — the byte-identical
    image/video dedup every multimodal ingest runs before the expensive
    near-dup pass (re-crawled assets are usually bit-identical).  Groups
    by md5 of the payload's uppercase-hex encoding — a bijection of the
    raw bytes, chosen over md5-of-bytes so the DuckDB twin
    (``md5(hex(payload))``; DuckDB's md5 only takes VARCHAR) replays the
    fingerprint exactly.  Keeps the minimum media_id per group.  Returns
    (fp, keep_id, n) — the exact_dedup contract on the binary column.

    Scale shape: the payload never leaves the read stage (fingerprint
    per batch, payload column dropped immediately), then one coarse
    fingerprint shuffle with native Min/Sum — byte volume through the
    exchange is hash-sized, not payload-sized."""
    import hashlib
    from ..functions.agg import coarse_grouped_aggregate

    def fp(batch: pa.Table) -> pa.Table:
        pay = batch.column("payload")
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        md5 = hashlib.md5
        fps = pa.array([md5(p.hex().upper().encode()).hexdigest()
                        if p is not None else None
                        for p in pay.to_pylist()], pa.string())
        t = pa.table({"fp": fps, "media_id": batch.column("media_id")})
        g = t.group_by("fp").aggregate([("media_id", "min"),
                                        ([], "count_all")])
        return g.rename_columns(["fp", "partial_keep", "partial_n"])

    ds = _read_media(sf_dir)
    return coarse_grouped_aggregate(
        ds.map_batches(fp, batch_size=_BATCH, batch_format="pyarrow"),
        "fp", [("partial_keep", "min", "keep_id"),
               ("partial_n", "sum", "n")])


def media_kind_bytes(sf_dir: str) -> "ray.data.Dataset":
    """Storage-planning rollup for the binary table: per media kind, item
    count, total/mean payload bytes — the numbers that size block/batch
    budgets for the binary stages.  Payload LENGTHS come from
    ``pc.binary_length`` (the bytes never leave the scan); per-batch
    partials reduce through one #kinds-sized groupby."""
    from ray.data.aggregate import Sum
    from ..functions.num import round6
    from ..sources.media import media_table_path

    ds = ray.data.read_parquet(media_table_path(sf_dir),
                               columns=["kind", "payload"])

    def partial(batch: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(batch.column("payload")),
                         pa.int64())
        t = pa.table({
            "kind": batch.column("kind"),
            "nbytes": nbytes,
            # AVG semantics: the mean denominator counts only rows with a
            # payload; NULL payloads are reported separately (n_null).
            "valid": pc.cast(pc.is_valid(nbytes), pa.int64()),
        })
        g = t.group_by("kind").aggregate([([], "count_all"),
                                          ("nbytes", "sum"),
                                          ("valid", "sum")])
        return g.rename_columns(["kind", "partial_n", "partial_b",
                                 "partial_v"])

    agg = (ds.map_batches(partial, batch_size=64, batch_format="pyarrow")
           .groupby("kind")
           .aggregate(Sum("partial_n", alias_name="n_items"),
                      Sum("partial_b", alias_name="total_bytes"),
                      Sum("partial_v", alias_name="n_payload")))

    def finish(batch: pa.Table) -> pa.Table:
        n_all = batch.column("n_items").to_numpy()
        n_valid = batch.column("n_payload").to_numpy().astype("float64")
        b = batch.column("total_bytes").to_numpy().astype("float64")
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(n_valid > 0, b / n_valid, np.nan)
        return pa.table({
            "kind": batch.column("kind"),
            "n_items": batch.column("n_items"),
            "n_null": pa.array(
                n_all - n_valid.astype("int64"), pa.int64()),
            "total_bytes": batch.column("total_bytes"),
            "mean_bytes": round6(pa.array(mean)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def media_integrity_check(sf_dir: str) -> "ray.data.Dataset":
    """Binary-payload integrity audit over the media table: per kind, how
    many payloads (a) are NULL, (b) carry the wrong container magic for
    their declared kind, (c) have header fields that contradict the
    table's metadata columns, or (d) have a byte length inconsistent
    with their own header — the corrupt-blob gate a multimodal ingest
    runs before handing payloads to decode actors.

    Container format is the synthetic FIMG/FAUD/FVID framing
    (sources/media.py:52-85); a real deployment swaps the magic/header
    parsers for PNG/WAV/MP4 ones — the Ray-side shape (vectorized
    ``binary_slice`` + numpy header parse per batch, #kinds-sized
    rollup) is identical.  SQL twin: hex()-of-payload + VARCHAR
    substring byte extraction (DuckDB v1.0.0 cannot slice BLOBs
    directly); also pinned by planted-corruption tests."""
    from ray.data.aggregate import Sum

    MAGICS = {"image": b"FIMG", "audio": b"FAUD", "video": b"FVID"}
    HDR_LEN = {"image": 5, "audio": 8, "video": 6}

    ds = ray.data.read_parquet(
        media_table_path(sf_dir),
        columns=["kind", "payload", "width", "height", "n_frames",
                 "sample_rate", "n_samples"])

    empty = pa.table({"kind": pa.array([], pa.string()),
                      "n_items": pa.array([], pa.int64()),
                      "n_null": pa.array([], pa.int64()),
                      "n_bad_magic": pa.array([], pa.int64()),
                      "n_meta_mismatch": pa.array([], pa.int64()),
                      "n_size_mismatch": pa.array([], pa.int64())})

    def check(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty.rename_columns(
                ["kind", "n_p", "null_p", "magic_p", "meta_p", "size_p"])
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        payload = batch.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        is_null = pc.is_null(payload).to_numpy(zero_copy_only=False)
        plen = pc.fill_null(pc.binary_length(payload), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        magic = pc.binary_slice(pc.fill_null(payload, b""), 0, 4) \
            .to_numpy(zero_copy_only=False)
        meta = {c: batch.column(c).to_numpy(zero_copy_only=False)
                     .astype(np.int64)
                for c in ("width", "height", "n_frames",
                          "sample_rate", "n_samples")}
        bad_magic = np.zeros(len(kind), bool)
        meta_bad = np.zeros(len(kind), bool)
        size_bad = np.zeros(len(kind), bool)
        hdr_raw = pc.binary_slice(pc.fill_null(payload, b""), 4, 12) \
            .to_numpy(zero_copy_only=False)
        for k, mg in MAGICS.items():
            m = (kind == k) & ~is_null
            if not m.any():
                continue
            bad_magic[m] = np.array([b != mg for b in magic[m]])
            ok = m & ~bad_magic
            idx = np.flatnonzero(ok)
            if not len(idx):
                continue
            hl = HDR_LEN[k]
            # rows long enough to carry the header parse it; shorter rows
            # are size mismatches outright
            short = plen[idx] < 4 + hl
            size_bad[idx[short]] = True
            good = idx[~short]
            if not len(good):
                continue
            hdr = np.frombuffer(
                b"".join(h[:hl] for h in hdr_raw[good]), np.uint8) \
                .reshape(len(good), hl)
            if k == "image":
                w = hdr[:, 0].astype(np.int64) | (hdr[:, 1].astype(np.int64) << 8)
                h = hdr[:, 2].astype(np.int64) | (hdr[:, 3].astype(np.int64) << 8)
                c = hdr[:, 4].astype(np.int64)
                meta_bad[good] = ((w != meta["width"][good])
                                  | (h != meta["height"][good]))
                size_bad[good] = plen[good] != 9 + w * h * c
            elif k == "audio":
                le = lambda a, o: (a[:, o].astype(np.int64)
                                   | (a[:, o + 1].astype(np.int64) << 8)
                                   | (a[:, o + 2].astype(np.int64) << 16)
                                   | (a[:, o + 3].astype(np.int64) << 24))
                sr, ns = le(hdr, 0), le(hdr, 4)
                meta_bad[good] = ((sr != meta["sample_rate"][good])
                                  | (ns != meta["n_samples"][good]))
                size_bad[good] = plen[good] != 12 + ns * 2
            else:                                   # video
                w = hdr[:, 0].astype(np.int64) | (hdr[:, 1].astype(np.int64) << 8)
                h = hdr[:, 2].astype(np.int64) | (hdr[:, 3].astype(np.int64) << 8)
                nf = hdr[:, 4].astype(np.int64) | (hdr[:, 5].astype(np.int64) << 8)
                meta_bad[good] = ((w != meta["width"][good])
                                  | (h != meta["height"][good])
                                  | (nf != meta["n_frames"][good]))
                size_bad[good] = plen[good] != 10 + w * h * nf
        unknown = ~np.isin(kind, list(MAGICS)) & ~is_null
        bad_magic |= unknown                    # unclassifiable container
        t = pa.table({
            "kind": batch.column("kind"),
            "n_p": pa.array(np.ones(len(kind), np.int64)),
            "null_p": pa.array(is_null.astype(np.int64)),
            "magic_p": pa.array(bad_magic.astype(np.int64)),
            "meta_p": pa.array(meta_bad.astype(np.int64)),
            "size_p": pa.array(size_bad.astype(np.int64)),
        })
        g = t.group_by("kind").aggregate(
            [("n_p", "sum"), ("null_p", "sum"), ("magic_p", "sum"),
             ("meta_p", "sum"), ("size_p", "sum")])
        return g.rename_columns(
            ["kind", "n_p", "null_p", "magic_p", "meta_p", "size_p"])

    return (ds.map_batches(check, batch_size=64, batch_format="pyarrow")
            .groupby("kind")
            .aggregate(Sum("n_p", alias_name="n_items"),
                       Sum("null_p", alias_name="n_null"),
                       Sum("magic_p", alias_name="n_bad_magic"),
                       Sum("meta_p", alias_name="n_meta_mismatch"),
                       Sum("size_p", alias_name="n_size_mismatch")))
