"""Driver-contract mirror: every queries() entry with an oracle_sql() twin
must match DuckDB exactly (row count, schema names, values) at sf0.001 —
the same comparison the driver runs at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if not len(df.columns):
            # Ray quirk: to_pandas() on a fully-empty Dataset drops the
            # columns even though schema() knows them — rebuild (the
            # sweep does the same)
            schema = res.schema()
            if schema is not None and schema.names:
                df = pa.schema(list(zip(schema.names, schema.types))) \
                    .empty_table().to_pandas()
        res = df
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # nested columns (list<struct> spans etc.) are unhashable sort keys;
    # canonical order comes from the scalar columns alone
    keys = [c for c in df.columns
            if not (len(df) and isinstance(df[c].iloc[0],
                                           (list, dict, np.ndarray)))]
    df = df.sort_values(by=keys or list(df.columns)[:1]) \
           .reset_index(drop=True)
    return df


# The flagship/table oracles read materialized corpus files generated for
# the driver's sf0.01 gate, so their pytest mirror must run at sf0.01 too.
_SF001_QUERIES = {"extract_kind_counts", "table_sources",
                  "extract_spans", "extract_markdown",
                  # raw-corpus queries: the no-arg oracle pins the
                  # sf0.01 corpus glob, so run the Ray side there too
                  "doc_modality_mix", "interleaved_pack_plan",
                  "extract_outline", "figure_caption_pairs",
                  "span_kind_transitions", "corpus_integrity_report",
                  "media_ref_manifest", "span_length_profile",
                  "page_span_stats", "span_term_search",
                  # footer profile: the no-arg twin pins the sf0.01
                  # lineitem file path
                  "parquet_storage_profile",
                  # media queries: the no-arg twins pin the sf0.01
                  # media table path
                  "media_exact_dedup", "media_kind_bytes",
                  "media_integrity_check"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(ray_session, name):
    sf = "/root/testdata/sf0.01" if name in _SF001_QUERIES else SF
    ray_result = _canon(_to_pandas(entrymod.queries()[name](sf)))
    oracle = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(ray_result.columns) == list(oracle.columns), \
        f"{name}: columns {list(ray_result.columns)} != {list(oracle.columns)}"
    assert len(ray_result) == len(oracle), \
        f"{name}: {len(ray_result)} rows != {len(oracle)}"
    for col in oracle.columns:
        a, b = ray_result[col], oracle[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=1e-12, equal_nan=True), f"{name}.{col}"
        else:
            mismatch = (a.astype(str).values != b.astype(str).values)
            assert not mismatch.any(), \
                f"{name}.{col}: first diff {a[mismatch].head(3).tolist()} vs {b[mismatch].head(3).tolist()}"


def test_non_sql_queries_run(ray_session):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        if name.startswith("extract"):
            continue  # covered by test_entry_smoke / e2e suite
        df = _to_pandas(qs[name](SF))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) >= 0 and list(res.columns) == ["doc_id", "spans"]
