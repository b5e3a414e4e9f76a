"""Hand-computed fixed-point check for the integer-micro PageRank: a
star graph's 3-iteration ranks are computed by hand with the exact floor
divisions, and a symmetric 2-node path is a fixed point of the
iteration (rank 1.0 forever)."""

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extract_kit_ray.pipelines.relational import part_pagerank


def _write_lineitem(d, baskets):
    """baskets: list of (orderkey, [partkeys])"""
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    t = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_partkey": pa.array(pk, pa.int64())})
    pq.write_table(t, d / "lineitem.parquet")


def test_star_graph_hand_computed(ray_session, tmp_path):
    """Hub 1 <-> leaves 2,3,4 (each edge co-ordered twice to clear
    min_count=2).  By hand, in micro-units with floor division:
      r1: hub 150000+3*850000 = 2700000; leaf 150000+850000//3*... =
          150000+(1000000*85)//300 = 433333
      r2: hub 150000+3*((433333*85)//100) = 1254999
          leaf 150000+(2700000*85)//300 = 915000
      r3: hub 150000+3*((915000*85)//100) = 2483250
          leaf 150000+(1254999*85)//300 = 505583
    """
    d = tmp_path / "sf"
    d.mkdir()
    baskets = []
    o = 0
    for leaf in (2, 3, 4):
        for _ in range(2):          # twice -> n_orders = 2 >= min_count
            baskets.append((o, [1, leaf]))
            o += 1
    _write_lineitem(d, baskets)
    df = part_pagerank(str(d)).to_pandas().set_index("p_partkey")
    assert df.loc[1, "pagerank"] == 2.48325
    for leaf in (2, 3, 4):
        assert df.loc[leaf, "pagerank"] == 0.505583
    # ordering: hub first, then leaves by partkey on the tie
    assert df.index.tolist() == [1, 2, 3, 4]


def test_symmetric_path_is_fixed_point(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_lineitem(d, [(0, [7, 8]), (1, [7, 8])])
    df = part_pagerank(str(d)).to_pandas()
    # deg 1 both sides: r = 150000 + (1000000*85)//100 = 1000000 forever
    assert df["pagerank"].tolist() == [1.0, 1.0]
    assert df["p_partkey"].tolist() == [7, 8]


def test_below_min_count_yields_empty(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_lineitem(d, [(0, [1, 2])])   # single co-order < min_count=2
    ds = part_pagerank(str(d))
    assert ds.count() == 0
    assert ds.schema().names == ["p_partkey", "pagerank"]
