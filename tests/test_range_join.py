"""broadcast_range_join primitive semantics (functions/joins.py):
inclusive bounds, overlapping intervals fan out, NULL probe matches
nothing, name collisions fail loudly."""

import pyarrow as pa
import pytest
import ray

from pdf_extract_kit_ray.functions.joins import broadcast_range_join


def _facts():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 5, 10, 15, None], pa.int64()),
        "tag": pa.array(list("abcde"), pa.string()),
    }))


def test_inclusive_bounds_and_overlap(ray_session):
    iv = pa.table({"win": pa.array([0, 1, 2], pa.int64()),
                   "lo": pa.array([1, 5, 100], pa.int64()),
                   "hi": pa.array([10, 20, 200], pa.int64())})
    rows = sorted((r["tag"], r["win"]) for r in
                  broadcast_range_join(_facts(), iv, on="k",
                                       start_col="lo",
                                       end_col="hi").take_all())
    # k=1 -> win0 edge; k=5 -> BOTH win0 and win1 (overlap); k=10 -> both
    # (hi inclusive); k=15 -> win1; NULL -> nothing
    assert rows == [("a", 0), ("b", 0), ("b", 1),
                    ("c", 0), ("c", 1), ("d", 1)]


def test_no_match_yields_typed_empty(ray_session):
    iv = pa.table({"win": pa.array([0], pa.int64()),
                   "lo": pa.array([100], pa.int64()),
                   "hi": pa.array([200], pa.int64())})
    out = broadcast_range_join(_facts(), iv, on="k",
                               start_col="lo", end_col="hi")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "tag", "win", "lo", "hi"}


def test_empty_interval_table(ray_session):
    iv = pa.table({"win": pa.array([], pa.int64()),
                   "lo": pa.array([], pa.int64()),
                   "hi": pa.array([], pa.int64())})
    assert broadcast_range_join(_facts(), iv, on="k", start_col="lo",
                                end_col="hi").count() == 0


def test_column_collision_raises(ray_session):
    iv = pa.table({"tag": pa.array([0], pa.int64()),
                   "lo": pa.array([0], pa.int64()),
                   "hi": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="collide"):
        broadcast_range_join(_facts(), iv, on="k",
                             start_col="lo", end_col="hi")
