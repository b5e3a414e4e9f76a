"""Round-4 advisor fixes, pinned by planted corpora:

1. chi2_independence must agree with its twin on STRUCTURAL ZEROS — a
   flag×status cell both marginals support but no row populates (classic
   TPC-H has empty A/O and R/O cells).  The statistic is full-grid
   Pearson chi² (a zero cell contributes its expected count E) and the
   twin expands over the cross join.
2. k_anonymity_report's rollup must emit a ZERO-ROW table for an empty
   block — a min_class_size=0 sentinel would win the global Min on any
   CPU-count/layout that hands a stage an empty block.
3. user_value_twap near the int64 budget: per-gap BIGINT-overflow raises
   (like the twin's multiply), per-user sums re-reduce exactly (like the
   twin's HUGEINT SUM) instead of numpy-wrapping.
"""

import datetime
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from pdf_extract_kit_ray.pipelines import relational, streaming
from pdf_extract_kit_ray.pipelines.relational import _k_anon_rollup


def _duck_dir(sf_dir: str, sql: str):
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            t = f[:-len(".parquet")]
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{os.path.join(sf_dir, f)}')")
    return con.execute(sql).df()


# ---------------------------------------------------------------- chi2


def _write_lineitem(tmp_path, flags, statuses):
    rows = [{"l_returnflag": f, "l_linestatus": s}
            for f, s, n in zip(flags, statuses, range(len(flags)))]
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string())]))
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t, os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def test_chi2_structural_zero_matches_twin(ray_session, tmp_path):
    """TPC-H-shaped corpus: flags {A,N,R} x statuses {F,O} with the A/O
    and R/O cells structurally empty.  Ray's full-grid loop and the
    cross-join-expanded twin must produce the identical chi2."""
    flags = ["A"] * 5 + ["R"] * 7 + ["N"] * 3 + ["N"] * 4
    stats = ["F"] * 5 + ["F"] * 7 + ["F"] * 3 + ["O"] * 4
    sf = _write_lineitem(tmp_path, flags, stats)
    ray_df = relational.chi2_independence(sf).to_pandas()
    sql_df = _duck_dir(sf, entrymod.oracle_sql()["chi2_independence"])
    assert int(ray_df["n_flags"][0]) == 3
    assert int(ray_df["n_statuses"][0]) == 2
    assert int(ray_df["dof"][0]) == 2
    for col in ["n_flags", "n_statuses", "n_rows", "dof", "chi2"]:
        assert float(ray_df[col][0]) == float(sql_df[col][0]), col
    # the full-grid statistic counts the two zero cells: hand-check one
    # term — cell (A, O): E = 5*4/19, term = E (obs 0)
    obs = np.array([[5, 0], [3, 4], [7, 0]], dtype=float)  # A, N, R
    total = obs.sum()
    exp = np.outer(obs.sum(1), obs.sum(0)) / total
    chi2_micro = sum(int(np.floor((obs[i, j] - exp[i, j]) ** 2
                                  / exp[i, j] * 1e6 + 0.5))
                     for i in range(3) for j in range(2)
                     if exp[i, j] > 0)
    assert float(ray_df["chi2"][0]) == pytest.approx(chi2_micro / 1e6,
                                                     abs=1e-9)


# ------------------------------------------------------- k-anonymity


def test_k_anon_rollup_empty_block_yields_no_rows():
    empty = pa.table({"nk": pa.array([], pa.int64()),
                      "seg": pa.array([], pa.string()),
                      "class_n": pa.array([], pa.int64())})
    out = _k_anon_rollup(empty, 5)
    assert out.num_rows == 0
    assert out.column_names == ["n_classes", "n_small_classes",
                                "n_rows_at_risk", "min_class_size"]


def test_k_anon_rollup_nonempty_min_is_true_min():
    t = pa.table({"class_n": pa.array([7, 3, 12], pa.int64())})
    out = _k_anon_rollup(t, 5)
    assert out.column("min_class_size").to_pylist() == [3]
    assert out.column("n_small_classes").to_pylist() == [1]
    assert out.column("n_rows_at_risk").to_pylist() == [3]


def test_k_anonymity_report_min_class_size_never_zero(ray_session,
                                                      tmp_path):
    """End-to-end on a tiny corpus: real class sizes are >= 1, so the
    report's min must be >= 1 regardless of block layout."""
    rows = [{"c_nationkey": i % 3, "c_mktsegment": "SEG%d" % (i % 2)}
            for i in range(17)]
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        ("c_nationkey", pa.int64()), ("c_mktsegment", pa.string())]))
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t, os.path.join(str(tmp_path), "customer.parquet"))
    df = relational.k_anonymity_report(str(tmp_path)).to_pandas()
    assert int(df["min_class_size"][0]) >= 1
    assert int(df["n_classes"][0]) == 6


# -------------------------------------------------------------- twap


def _write_events(tmp_path, rows):
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64())]))
    os.makedirs(str(tmp_path), exist_ok=True)
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def _ev(i, sec, uid, value):
    return {"event_id": i, "user_id": uid, "event_type": "x",
            "value": value,
            "ts": datetime.datetime(2020, 1, 1)
            + datetime.timedelta(seconds=sec)}


def test_twap_per_gap_overflow_raises_like_the_twin(ray_session,
                                                    tmp_path):
    """A $92M value held for ~4 years: cents*microseconds > BIGINT.
    DuckDB raises on the multiply; the Ray engine must fail loudly too,
    not wrap."""
    yr = 365 * 24 * 3600
    rows = [_ev(1, 0, 1, 9.2e7), _ev(2, 4 * yr, 1, 1.0)]
    sf = _write_events(tmp_path, rows)
    # raises(Exception) alone would pass on ANY failure; pin the
    # engine's specific overflow message (Ray wraps the OverflowError,
    # so match on the message text, not the exception type)
    with pytest.raises(Exception, match=r"user_value_twap: "
                                        r"value_cents\*duration_us") as ei:
        streaming.user_value_twap(sf).to_pandas()
    assert "OverflowError" in str(ei.value)
    with pytest.raises(Exception):
        _duck_dir(sf, entrymod.oracle_sql()["user_value_twap"])


def test_twap_big_accumulation_matches_hugeint_twin(ray_session,
                                                    tmp_path):
    """Per-gap products fit BIGINT but their per-user sum exceeds it
    (1.2e19 > 2^63).  numpy reduceat would wrap to a negative twap; the
    exact Python-bigint path must match DuckDB's HUGEINT SUM."""
    v = 8.0e9   # vc = 8e11 cents; per-gap product 8e18 < 2^63 (10 s gaps)
    rows = [_ev(1, 0, 1, v), _ev(2, 10, 1, v), _ev(3, 20, 1, v),
            _ev(4, 30, 1, 0.0)]  # 3 ten-second gaps -> sum 2.4e19 > 2^63
    sf = _write_events(tmp_path, rows)
    ray_df = streaming.user_value_twap(sf).to_pandas()
    sql_df = _duck_dir(sf, entrymod.oracle_sql()["user_value_twap"])
    assert len(ray_df) == 1 and len(sql_df) == 1
    assert float(ray_df["twap"][0]) > 0          # a wrap would go negative
    assert float(ray_df["twap"][0]) == pytest.approx(
        float(sql_df["twap"][0]), rel=1e-12)
    assert float(ray_df["total_dur_s"][0]) == float(sql_df["total_dur_s"][0])
    assert int(ray_df["n_gaps"][0]) == int(sql_df["n_gaps"][0])


def test_twap_normal_path_unchanged(ray_session, tmp_path):
    """Plain small-value corpus still matches the twin exactly."""
    rows = [_ev(1, 0, 1, 10.0), _ev(2, 10, 1, 20.0), _ev(3, 30, 1, 5.0),
            _ev(4, 0, 2, 7.5), _ev(5, 40, 2, 7.5)]
    sf = _write_events(tmp_path, rows)
    ray_df = streaming.user_value_twap(sf).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    sql_df = _duck_dir(sf, entrymod.oracle_sql()["user_value_twap"]) \
        .sort_values("user_id").reset_index(drop=True)
    for col in ["user_id", "n_gaps", "total_dur_s", "twap"]:
        assert list(ray_df[col]) == list(sql_df[col]), col
