"""Discriminating edges for the one-pass correlation profiler: exact +-1
on perfectly-correlated columns, NULL corr for a zero-variance column,
the shared-n null-row contract, and the loud int64 snap guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_kit_ray.pipelines.streaming import numeric_correlations


def _write(d, cols):
    n = len(next(iter(cols.values())))
    t = pa.table({k: pa.array(v, pa.float64()) for k, v in cols.items()})
    pq.write_table(t, d / "lineitem.parquet")


def test_perfect_and_zero_variance(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    x = [1.0, 2.0, 3.0, 4.0]
    _write(d, {
        "a": x,                       # a ~ b perfectly (+1)
        "b": [2 * v for v in x],
        "c": [5.0 - v for v in x],    # anti-correlated (-1)
        "k": [7.0] * 4,               # zero variance -> NULL corr
    })
    df = numeric_correlations(
        str(d), cols=(("a", 1.0), ("b", 1.0), ("c", 1.0), ("k", 1.0))) \
        .to_pandas().set_index(["x_col", "y_col"])
    assert df.loc[("a", "b"), "corr"] == 1.0
    assert df.loc[("a", "c"), "corr"] == -1.0
    assert pd.isna(df.loc[("a", "k"), "corr"])
    assert pd.isna(df.loc[("b", "k"), "corr"])
    assert (df["n"] == 4).all()
    assert len(df) == 6


def test_null_rows_drop_from_every_pair(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "a": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
        "b": pa.array([2.0, 4.0, None, 8.0], pa.float64()),
    })
    pq.write_table(t, d / "lineitem.parquet")
    df = numeric_correlations(str(d), cols=(("a", 1.0), ("b", 1.0))) \
        .to_pandas()
    # rows 3 and 4 each carry a null somewhere -> shared n is 2
    assert df["n"].tolist() == [2]
    assert df["corr"].tolist() == [1.0]


def test_snap_guard_raises_loudly(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write(d, {"a": [1.0, 3.0e6], "b": [1.0, 2.0]})
    with pytest.raises(Exception, match="int64 partial-sum contract"):
        numeric_correlations(str(d), cols=(("a", 1.0), ("b", 1.0))) \
            .to_pandas()


def test_empty_table_returns_typed_empty(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write(d, {"a": [], "b": []})
    ds = numeric_correlations(str(d), cols=(("a", 1.0), ("b", 1.0)))
    assert ds.count() == 0
    assert ds.schema().names == ["x_col", "y_col", "n", "corr"]
