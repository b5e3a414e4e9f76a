"""Discriminating edges for the Q2/Q11/Q16/Q20-shaped queries that the
corpus hash-match may not exercise: argmin tie-breaks, the packed-int
contract guard, strict threshold comparisons, distinct-count semantics
under the exclusion list, and the exactly-half window-share boundary."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_kit_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def _write_dims(d, *, nations=1):
    """Region/nation/supplier dimensions shared by the planted fixtures.

    Suppliers 1..3 live in NATION_0 (region ASIA); supplier 4 lives in
    NATION_1 (region EUROPE) so region/nation filters have a discriminating
    row.  Supplier 9 carries a negative balance (the complaints analog).
    """
    region = pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_0", "NATION_1"], pa.string()),
        "n_regionkey": pa.array([0, 1], pa.int32()),
    })
    supp = pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 9], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3", "S4", "S9"], pa.string()),
        "s_nationkey": pa.array([0, 0, 0, 1, 0], pa.int32()),
        "s_acctbal": pa.array([100.0, 50.0, 25.0, 10.0, -5.0],
                              pa.float64()),
    })
    pq.write_table(region, d / "region.parquet")
    pq.write_table(nation, d / "nation.parquet")
    pq.write_table(supp, d / "supplier.parquet")


def _write_parts(d, rows):
    """rows: (p_partkey, p_name, p_brand, p_type, p_size)"""
    t = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": pa.array([r[1] for r in rows], pa.string()),
        "p_brand": pa.array([r[2] for r in rows], pa.string()),
        "p_type": pa.array([r[3] for r in rows], pa.string()),
        "p_size": pa.array([r[4] for r in rows], pa.int32()),
        "p_retailprice": pa.array([1.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, d / "part.parquet")


def _write_lines(d, rows):
    """rows: (l_partkey, l_suppkey, l_extendedprice, l_quantity,
    l_discount, l_shipdate)"""
    t = pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
        "l_discount": pa.array([r[4] for r in rows], pa.float64()),
        "l_shipdate": pa.array([pd.Timestamp(r[5]) for r in rows],
                               pa.timestamp("us")),
    })
    pq.write_table(t, d / "lineitem.parquet")


def test_min_cost_supplier_tie_breaks_to_smallest_suppkey(
        ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    _write_parts(d, [(1, "p one", "Brand#1", "STANDARD", 13),
                     (2, "p two", "Brand#1", "STANDARD", 13),
                     (3, "wrong size", "Brand#1", "STANDARD", 7)])
    _write_lines(d, [
        # part 1: supp 2's unit cost aggregates over two lines to 10.0;
        # supp 1 matches it exactly -> tie -> smallest suppkey (1) wins
        (1, 2, 30.0, 2, 0.0, "1997-06-01"),
        (1, 2, 10.0, 2, 0.0, "1997-06-01"),
        (1, 1, 10.0, 1, 0.0, "1997-06-01"),
        # part 1: supp 4 is cheaper but in EUROPE -> region-filtered out
        (1, 4, 1.0, 1, 0.0, "1997-06-01"),
        # part 2: only supp 3 -> trivially the minimum
        (2, 3, 50.0, 2, 0.0, "1997-06-01"),
        # part 3 has the wrong size -> never appears
        (3, 1, 1.0, 1, 0.0, "1997-06-01"),
    ])
    df = relational.min_cost_supplier(str(d)).to_pandas()
    got = {int(r.p_partkey): (r.s_name, r.supply_cost)
           for r in df.itertuples()}
    assert got == {1: ("S1", 10.0), 2: ("S3", 25.0)}
    # ordering: s_acctbal desc (S1=100 before S3=25)
    assert df["s_name"].tolist() == ["S1", "S3"]


def test_min_cost_supplier_packed_contract_raises(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    _write_parts(d, [(1, "p one", "Brand#1", "STANDARD", 13)])
    # unit price 3e6 dollars -> cost_micro = 3e12 >= 2^41: must fail loudly
    _write_lines(d, [(1, 1, 3.0e6, 1, 0.0, "1997-06-01")])
    with pytest.raises(Exception, match="packed-argmin contract"):
        relational.min_cost_supplier(str(d)).to_pandas()


def test_important_parts_threshold_is_strict(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    # two parts with IDENTICAL value: each equals the mean, and the
    # comparison is strictly-greater -> with mult=1.0 nothing passes,
    # and the typed schema survives the fully-empty output
    _write_lines(d, [
        (1, 1, 100.0, 1, 0.0, "1997-06-01"),
        (2, 2, 100.0, 1, 0.0, "1997-06-01"),
    ])
    ds = relational.important_parts(str(d), nation="NATION_0", mult=1.0)
    assert ds.schema().names == ["p_partkey", "value"]
    assert ds.count() == 0

    # mult < 1 keeps both, ordered value desc then partkey asc on the tie
    df = relational.important_parts(str(d), nation="NATION_0",
                                    mult=0.5).to_pandas()
    assert df["p_partkey"].tolist() == [1, 2]
    assert df["value"].tolist() == [100.0, 100.0]


def test_important_parts_other_nation_excluded(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    _write_lines(d, [
        (1, 1, 100.0, 1, 0.0, "1997-06-01"),   # NATION_0 supplier
        (2, 4, 900.0, 1, 0.0, "1997-06-01"),   # NATION_1 supplier
    ])
    df = relational.important_parts(str(d), nation="NATION_0",
                                    mult=0.5).to_pandas()
    assert df["p_partkey"].tolist() == [1]


def test_supplier_part_variety_distinct_and_exclusions(
        ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    _write_parts(d, [
        (1, "a", "Brand#1", "SMALL", 4),
        (2, "b", "Brand#1", "SMALL", 4),     # same bucket as part 1
        (3, "c", "Brand#2", "LARGE", 9),
        (4, "d", "Brand#45", "SMALL", 4),    # excluded brand
        (5, "e", "Brand#1", "MEDIUM", 4),    # excluded type
        (6, "f", "Brand#1", "SMALL", 5),     # size not in list
    ])
    _write_lines(d, [
        # bucket (Brand#1, SMALL, 4): supp 1 ships parts 1 AND 2 (one
        # distinct supplier), supp 1 ships part 1 twice (still one),
        # supp 2 ships part 2, supp 9 (negative balance) is excluded
        (1, 1, 10.0, 1, 0.0, "1997-06-01"),
        (1, 1, 10.0, 1, 0.0, "1997-06-01"),
        (2, 1, 10.0, 1, 0.0, "1997-06-01"),
        (2, 2, 10.0, 1, 0.0, "1997-06-01"),
        (1, 9, 10.0, 1, 0.0, "1997-06-01"),
        # bucket (Brand#2, LARGE, 9): one supplier
        (3, 3, 10.0, 1, 0.0, "1997-06-01"),
        # filtered parts never contribute
        (4, 1, 10.0, 1, 0.0, "1997-06-01"),
        (5, 1, 10.0, 1, 0.0, "1997-06-01"),
        (6, 1, 10.0, 1, 0.0, "1997-06-01"),
    ])
    df = relational.supplier_part_variety(str(d)).to_pandas()
    got = {(r.p_brand, r.p_type, int(r.p_size)): int(r.supplier_cnt)
           for r in df.itertuples()}
    assert got == {("Brand#1", "SMALL", 4): 2, ("Brand#2", "LARGE", 9): 1}
    # ordering: count desc first
    assert df["supplier_cnt"].tolist() == [2, 1]


def test_excess_shipped_suppliers_half_boundary_and_filters(
        ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_dims(d)
    _write_parts(d, [(1, "red widget", "Brand#1", "SMALL", 4),
                     (2, "red gear", "Brand#1", "SMALL", 4),
                     (3, "blue widget", "Brand#1", "SMALL", 4)])
    in_win, out_win = "1997-06-01", "1999-06-01"
    _write_lines(d, [
        # supp 1 / part 1: window 10 of 20 total -> EXACTLY half, excluded
        (1, 1, 10.0, 10, 0.0, in_win),
        (1, 1, 10.0, 10, 0.0, out_win),
        # supp 2 / part 1: window 11 of 20 -> qualifies
        (1, 2, 10.0, 11, 0.0, in_win),
        (1, 2, 10.0, 9, 0.0, out_win),
        # supp 3 qualifies only via the non-matching part 3 -> excluded
        (3, 3, 10.0, 5, 0.0, in_win),
        # supp 4 qualifies via part 2 but is in NATION_1 -> nation filter
        (2, 4, 10.0, 5, 0.0, in_win),
    ])
    df = relational.excess_shipped_suppliers(
        str(d), prefix="red ", nation="NATION_0").to_pandas()
    assert df["s_suppkey"].tolist() == [2]
    assert df["s_name"].tolist() == ["S2"]

    # the same fixture viewed from NATION_1 returns supplier 4
    df = relational.excess_shipped_suppliers(
        str(d), prefix="red ", nation="NATION_1").to_pandas()
    assert df["s_suppkey"].tolist() == [4]
