"""part_adamic_adar on a hand-computable star graph: center 100 linked
to leaves 1..4 (each leaf co-purchased with the center in two orders, so
min_count=2 edges exist center-leaf only).  Every leaf pair (i, j) is a
non-adjacent wedge pair through the center: AA = 1/ln(4) snapped to
nano-units.  Leaves (degree 1) can't be apexes; center-leaf pairs are
edges and must be excluded.  Also pins the degree-cap contract and the
DuckDB twin on the same table."""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E
from pdf_extract_kit_ray.pipelines.relational import part_adamic_adar


def _star_lineitem(d: str) -> None:
    i64 = pa.int64()
    orders, parts = [], []
    ok = 100
    for leaf in (1, 2, 3, 4):
        for _ in range(2):                 # two orders per center-leaf edge
            orders += [ok, ok]
            parts += [100, leaf]
            ok += 1
    pq.write_table(pa.table({"l_orderkey": pa.array(orders, i64),
                             "l_partkey": pa.array(parts, i64)}),
                   os.path.join(d, "lineitem.parquet"))


def test_star_graph_scores(ray_session, tmp_path):
    d = str(tmp_path)
    _star_lineitem(d)
    res = part_adamic_adar(d).to_pandas() \
        .sort_values(["part_a", "part_b"]).reset_index(drop=True)
    expect_pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert list(zip(res["part_a"], res["part_b"])) == expect_pairs
    aa = math.floor(1e9 / math.log(4) + 0.5) / 1e9
    assert (res["aa_score"] == round(aa, 6)).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{d}/lineitem.parquet')")
    oracle = con.execute(E.oracle_sql()["part_adamic_adar"]).df() \
        .sort_values(["part_a", "part_b"]).reset_index(drop=True)
    assert oracle.equals(res[oracle.columns.tolist()])


def test_degree_cap_contract(ray_session, tmp_path):
    """Apexes above max_center_degree are excluded BY CONTRACT: with the
    cap below the center's degree the star produces no scored pairs."""
    d = str(tmp_path)
    _star_lineitem(d)
    ds = part_adamic_adar(d, max_center_degree=3)
    assert ds.count() == 0
    # empty-Dataset.to_pandas drops columns (the documented Ray quirk);
    # the schema is the contract
    assert ds.schema().names == ["part_a", "part_b", "aa_score"]
