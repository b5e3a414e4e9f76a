"""Shared membership-union candidate-pair verification.

THE distributed shape for "verify LSH candidate pairs against their full
payloads without materializing anything on the driver" (used by
``minhash_dedup`` for text/Jaccard and ``media_feature_neardup`` for
feature-vector/cosine — previously two hand-rolled copies that had already
drifted on an edge case):

1. candidate pairs explode to per-side MEMBERSHIP rows (2 rows/pair,
   payload null, sentinel a = -1 marks payload rows);
2. the item table emits (id, payload) rows;
3. their union takes ONE hash shuffle on the member id — payloads ship
   ONCE, never replicated per band — and a coarse-bucketed group attaches
   each member's payload to every pair it participates in (sorted ids +
   searchsorted probe, membership triples deduped across bands);
4. a second, candidate-sized coarse groupby brings each pair's two
   payload-carrying side rows together and hands the aligned sides to the
   caller's ``verify`` kernel.

Shuffle volume: corpus payload once + O(|candidates|) small rows; driver
memory flat at any corpus size.  Both groupbys are COARSE-bucketed (many
keys per group) so per-group dispatch cost amortizes and group bodies stay
vectorized.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MIX = np.int64(1000003)


def verify_candidate_pairs(items: "ray.data.Dataset",
                           cand: "ray.data.Dataset", *,
                           id_col: str, payload_col: str,
                           payload_type: pa.DataType,
                           num_coarse: int,
                           verify: Callable[..., pa.Table],
                           a_col: str = "a",
                           b_col: str = "b") -> "ray.data.Dataset":
    """Attach payloads to candidate pairs and verify them, distributed.

    ``items``: Dataset with (id_col:int64-castable, payload_col).
    ``cand``: Dataset of candidate pairs (a_col, b_col), both int64 ids.
    ``verify(a_ids, b_ids, payload_a, payload_b) -> pa.Table``: called per
    coarse pair group with numpy id arrays and pair-aligned Arrow payload
    arrays (a-side, b-side); MUST return a correctly-typed table even for
    zero pairs.  Pairs where either side's payload is missing are dropped
    before ``verify`` (the size==2 contract).  Self pairs (a == b) are
    NOT supported — their two membership rows dedupe to one and the pair
    is silently dropped; candidate generators never emit them (a < b by
    construction)."""
    schema = pa.schema([("mcoarse", pa.int64()), ("member_id", pa.int64()),
                        ("a", pa.int64()), ("b", pa.int64()),
                        ("payload", payload_type)])

    def pair_members(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy()
        b = batch.column(b_col).to_numpy()
        member = np.concatenate([a, b])
        return pa.table({
            "mcoarse": pa.array(member % num_coarse, pa.int64()),
            "member_id": pa.array(member, pa.int64()),
            "a": pa.array(np.concatenate([a, a]), pa.int64()),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "payload": pa.nulls(2 * len(a), payload_type),
        }, schema=schema)

    def item_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).cast(pa.int64())
        return pa.table({
            "mcoarse": pc.cast(
                pc.subtract(ids, pc.multiply(
                    pc.divide(ids, num_coarse), num_coarse)), pa.int64()),
            "member_id": ids,
            "a": pa.array(np.full(n, -1), pa.int64()),
            "b": pa.array(np.full(n, -1), pa.int64()),
            "payload": batch.column(payload_col),
        }, schema=schema)

    def attach(group: pa.Table) -> pa.Table:
        """One coarse member group: payload rows + membership rows for
        MANY member ids, attached vectorized (sorted item ids +
        searchsorted probe; (member, a, b) triples deduped across
        bands)."""
        empty = pa.table({"pcoarse": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "is_a": pa.array([], pa.bool_()),
                          "payload": pa.array([], payload_type)})
        is_item = pc.equal(group.column("a"), -1).combine_chunks()
        item_part = group.filter(is_item)
        # a NULL payload counts as a MISSING side (its pairs drop at the
        # size==2 gate) — without this, null-text docs / null feature
        # lists would reach the caller's verify kernel and crash it
        item_part = item_part.filter(
            pc.is_valid(item_part.column("payload")))
        members = group.filter(pc.invert(is_item))
        if members.num_rows == 0 or item_part.num_rows == 0:
            return empty
        iid = item_part.column("member_id").to_numpy()
        forder = np.argsort(iid)
        iid = iid[forder]
        payload = item_part.column("payload").combine_chunks() \
            .take(pa.array(forder, pa.int64()))
        m = members.column("member_id").to_numpy()
        a = members.column("a").to_numpy()
        b = members.column("b").to_numpy()
        order = np.lexsort((b, a, m))
        m, a, b = m[order], a[order], b[order]
        keep = np.r_[True, (m[1:] != m[:-1]) | (a[1:] != a[:-1])
                     | (b[1:] != b[:-1])]
        m, a, b = m[keep], a[keep], b[keep]
        pos = np.searchsorted(iid, m)
        valid = (pos < len(iid)) & (iid[np.minimum(pos, len(iid) - 1)] == m)
        m, a, b, pos = m[valid], a[valid], b[valid], pos[valid]
        if not len(m):
            return empty
        pcoarse = (a * _MIX + b) % num_coarse
        return pa.table({
            "pcoarse": pa.array(pcoarse, pa.int64()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "is_a": pa.array(m == a, pa.bool_()),
            "payload": payload.take(pa.array(pos, pa.int64()))})

    def verify_groups(group: pa.Table) -> pa.Table:
        """One coarse pair group: sort each pair's two side rows together
        (a-side first), keep complete pairs, hand aligned sides to the
        caller's kernel."""
        a = group.column("a").to_numpy()
        b = group.column("b").to_numpy()
        is_a = group.column("is_a").to_numpy(zero_copy_only=False)
        order = np.lexsort((~is_a, b, a))
        a, b = a[order], b[order]
        payload = group.column("payload").combine_chunks() \
            .take(pa.array(order, pa.int64()))
        new_pair = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        bounds = np.r_[np.flatnonzero(new_pair), len(a)]
        sizes = np.diff(bounds)
        starts = bounds[:-1][sizes == 2]       # both sides present
        return verify(a[starts], b[starts],
                      payload.take(pa.array(starts, pa.int64())),
                      payload.take(pa.array(starts + 1, pa.int64())))

    members = cand.map_batches(pair_members, batch_format="pyarrow")
    sides = items.map_batches(item_rows, batch_format="pyarrow")
    return (sides.union(members)
                 .groupby("mcoarse")
                 .map_groups(attach, batch_format="pyarrow")
                 .groupby("pcoarse")
                 .map_groups(verify_groups, batch_format="pyarrow"))
