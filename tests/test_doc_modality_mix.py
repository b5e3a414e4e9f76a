"""doc_modality_mix pytest twin at sf0.001 (the driver sweep covers
sf0.01/sf0.1): full-frame equality against an in-test DuckDB oracle in
LIST-position order, plus internal-consistency invariants (offsets
restart per page in this corpus, so a naive offset ordering would
miscount transitions — the bug class this file pins)."""

import duckdb
import pandas as pd

import __ray_entry__ as E


def test_matches_duckdb_and_invariants(ray_session):
    sf = "/root/testdata/sf0.001"
    mine = E.queries()["doc_modality_mix"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    raw = E._corpus_path(sf)
    orc = duckdb.sql(f"""
        WITH ex AS (
            SELECT doc_id, unnest(spans) AS s,
                   generate_subscripts(spans, 1) AS pos
            FROM read_parquet('{raw}/*.parquet')
        ), flat AS (
            SELECT doc_id, pos,
                   CASE WHEN s.media_ref LIKE 'media://%'
                        THEN 1 ELSE 0 END AS im,
                   CASE WHEN s.text <> '' THEN 1 ELSE 0 END AS ht
            FROM ex
        ), lagged AS (
            SELECT doc_id, im, ht,
                   lag(im) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM flat
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(im) AS BIGINT) AS n_media_spans,
               CAST(sum(ht) AS BIGINT) AS n_text_spans,
               CAST(count(*) FILTER (WHERE prev IS NOT NULL
                                     AND prev <> im) AS BIGINT)
                   AS n_transitions,
               round(CAST(sum(im) AS DOUBLE) / count(*), 6) AS media_frac
        FROM lagged GROUP BY 1 ORDER BY 1""").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # invariants: transitions bounded by adjacency; media_frac in [0,1];
    # every span is media- or layout-kind (counts consistent)
    assert (mine["n_transitions"] <= mine["n_spans"] - 1).all()
    assert mine["media_frac"].between(0.0, 1.0).all()
    assert (mine["n_media_spans"] <= mine["n_spans"]).all()
    # the corpus interleaves: at least one doc has a real transition
    assert (mine["n_transitions"] > 0).any()
