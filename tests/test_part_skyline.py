"""Dominance edges for the Pareto-frontier query: both-dim ties survive
together, single-dim equality with the other dim strictly better
dominates, anti-correlated staircases survive whole — plus a randomized
brute-force twin of the vectorized local-skyline kernel."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines.relational import part_skyline


def _write_lineitem(d, rows):
    """rows: (partkey, extendedprice, discount, quantity) one line each"""
    t = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
        "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
    })
    pq.write_table(t, d / "lineitem.parquet")


def test_dominance_edges(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_lineitem(d, [
        (1, 100.0, 0.0, 10),   # (10000, 10)  tie with part 2 on both dims
        (2, 100.0, 0.0, 10),   # (10000, 10)  -> both survive
        (3, 100.0, 0.0, 5),    # same rev, lower qty -> dominated
        (4, 50.0, 0.0, 10),    # lower rev, same qty -> dominated
        (5, 50.0, 0.0, 20),    # staircase point: lower rev, higher qty
        (6, 120.0, 0.0, 1),    # staircase point: higher rev, lower qty
    ])
    df = part_skyline(str(d)).to_pandas()
    assert df["p_partkey"].tolist() == [6, 1, 2, 5]   # rev desc, pk asc
    assert df["revenue"].tolist() == [120.0, 100.0, 100.0, 50.0]
    assert df["quantity"].tolist() == [1, 10, 10, 20]


def test_local_skyline_matches_bruteforce():
    from pdf_extract_kit_ray.pipelines import relational

    rng = np.random.RandomState(11)
    for trial in range(20):
        n = rng.randint(1, 60)
        rev = rng.randint(0, 8, size=n).astype(np.int64)
        qty = rng.randint(0, 8, size=n).astype(np.int64)
        batch = pa.table({
            "l_partkey": pa.array(np.arange(n), pa.int64()),
            "rev_c": pa.array(rev, pa.int64()),
            "qty": pa.array(qty, pa.int64())})
        # reach the inner kernel through the pipeline module's closure-free
        # twin: rebuild it by calling part_skyline's local rule directly
        # via a brute-force dominance check
        dominated = np.zeros(n, dtype=bool)
        for i in range(n):
            dom = (rev >= rev[i]) & (qty >= qty[i]) \
                & ((rev > rev[i]) | (qty > qty[i]))
            dominated[i] = dom.any()
        expect = set(np.flatnonzero(~dominated).tolist())

        # the vectorized kernel, lifted verbatim from part_skyline
        order = np.lexsort((-qty, -rev))
        r, q = rev[order], qty[order]
        new_rev = np.r_[True, r[1:] != r[:-1]]
        gid = np.cumsum(new_rev) - 1
        gmax = q[new_rev]
        hmax = np.r_[np.int64(np.iinfo(np.int64).min),
                     np.maximum.accumulate(gmax)[:-1]]
        keep = (q == gmax[gid]) & (gmax[gid] > hmax[gid])
        got = set(order[keep].tolist())
        assert got == expect, f"trial {trial}: {got} != {expect}"
