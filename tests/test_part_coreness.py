"""part_coreness: exact equality against a single-node Batagelj-
Zaversnik peeling reference — on a hand-computable clique+pendant graph
AND on the real sf0.001 affinity graph (same edge derivation)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def _peel_coreness(edges):
    """Reference: repeatedly remove the minimum-degree node; its degree
    at removal (monotone max) is its coreness."""
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    live = set(adj)
    while live:
        v = min(live, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u in live and u != v:
                deg[u] -= 1
        live.remove(v)
    return core


def _run(sf_dir):
    return E.queries()["part_coreness"](sf_dir).to_pandas() \
        .sort_values("p_partkey").reset_index(drop=True)


def test_clique_plus_pendant(ray_session, tmp_path):
    d = str(tmp_path)
    i64 = pa.int64()
    orders, parts = [], []
    for ok in (100, 101):                 # 4-clique {1,2,3,4}
        for p in (1, 2, 3, 4):
            orders.append(ok)
            parts.append(p)
    for ok in (102, 103):                 # pendant edge 4-5
        for p in (4, 5):
            orders.append(ok)
            parts.append(p)
    pq.write_table(pa.table({"l_orderkey": pa.array(orders, i64),
                             "l_partkey": pa.array(parts, i64)}),
                   os.path.join(d, "lineitem.parquet"))
    got = _run(d)
    assert list(got["p_partkey"]) == [1, 2, 3, 4, 5]
    assert list(got["coreness"]) == [3, 3, 3, 3, 1]
    assert list(got["degree"]) == [3, 3, 3, 4, 1]


def test_matches_peeling_on_sf0001(ray_session):
    sf = "/root/testdata/sf0.001"
    got = _run(sf)
    pairs = E.queries()["part_affinity_pairs"](sf).to_pandas()
    edges = list(zip(pairs["part_a"], pairs["part_b"]))
    ref = _peel_coreness(edges)
    assert len(got) == len(ref)
    mine = dict(zip(got["p_partkey"], got["coreness"]))
    assert mine == ref
    # h-index fixpoint is bounded below by 1 and above by degree
    assert (got["coreness"] >= 1).all()
    assert (got["coreness"] <= got["degree"]).all()
