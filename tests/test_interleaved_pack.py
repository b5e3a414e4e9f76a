"""interleaved_pack_plan twin + invariants at sf0.001 (the sweep covers
sf0.01/sf0.1): offsets form an exact prefix chain in doc_id order, media
spans cost exactly 64 slots, and the packing agrees with an in-test
DuckDB window oracle."""

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_pack_plan_matches_and_chains(ray_session):
    sf = "/root/testdata/sf0.001"
    mine = E.queries()["interleaved_pack_plan"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orc = duckdb.sql(E.oracle_sql(sf)["interleaved_pack_plan"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)

    # exact prefix chain: cost_start[i+1] == cost_start[i] + cost[i]
    cs = mine["cost_start"].to_numpy()
    c = mine["cost"].to_numpy()
    assert cs[0] == 0
    assert np.array_equal(cs[1:], cs[:-1] + c[:-1])
    # media spans cost exactly 64 slots on top of the text tokens
    assert np.array_equal(
        c, mine["n_text_tokens"].to_numpy()
        + 64 * mine["n_media_spans"].to_numpy())
    # seq bookkeeping is consistent with the budget
    assert np.array_equal(mine["seq_id"].to_numpy(), cs // 2048)
    assert np.array_equal(mine["seq_off"].to_numpy(), cs % 2048)
    # the corpus actually interleaves: some docs pay a media cost
    assert (mine["n_media_spans"] > 0).any()
