"""extract_lineage_report: the driver-visible lineage surface must be
deterministic across runs and agree with the on-disk manifests the
resumable writer committed."""

import glob
import json
import os

import pandas as pd

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def test_lineage_deterministic_and_disk_backed(ray_session):
    r1 = E.queries()["extract_lineage_report"](SF).to_pandas()
    r2 = E.queries()["extract_lineage_report"](SF).to_pandas()
    pd.testing.assert_frame_equal(r1, r2)

    assert list(r1.columns) == ["partition_id", "n_docs", "n_spans",
                                "checksum"]
    assert r1["partition_id"].is_monotonic_increasing
    assert int(r1["n_docs"].sum()) == 60          # every sf0.001 doc landed
    assert (r1["n_docs"] > 0).all()

    # the report rows ARE the on-disk manifests (path/elapsed_ms aside)
    disk = {}
    for mf in glob.glob("/tmp/pek_lineage/sf0.001/part=*/_MANIFEST.json"):
        with open(mf) as f:
            m = json.load(f)
        disk[m["partition_id"]] = m
    assert len(disk) == len(r1)
    for row in r1.itertuples():
        m = disk[row.partition_id]
        assert (m["n_docs"], m["n_spans"], m["checksum"]) == \
            (row.n_docs, row.n_spans, row.checksum)
