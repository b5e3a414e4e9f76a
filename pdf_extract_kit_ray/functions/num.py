"""Numeric kernels shared across pipelines."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def round6(x) -> pa.Array:
    """6dp round via integer micro-units, half away from zero — THE single
    definition of decimal rounding for every ratio/score the engine emits.

    This is the same arithmetic DuckDB's ``round(x, 6)`` performs
    (scale-multiply, ``std::round`` half away from zero, divide), so the
    resulting DOUBLE is bit-identical to the SQL twins' — required because
    the correctness driver hashes values bit-exactly.  Arrow's
    ``pc.round(x, ndigits=6)`` and Python's ``round`` both avoid the
    scale-multiply and can land one ulp away.

    The rounded scale stays a DOUBLE end-to-end (as DuckDB's does): an
    int64 roundtrip would be a bit-exact no-op below 2^53 but RAISES on
    Arrow's checked int->float cast above it, where DuckDB happily
    rounds (a double that large has no fractional part) — the regime
    large variances/sums legitimately reach.
    """
    micro = pc.round(pc.multiply(x, 1000000.0), ndigits=0,
                     round_mode="half_towards_infinity")
    return pc.divide(micro, 1000000.0)


def round6_scalar(x: float) -> float:
    """Scalar form of :func:`round6` for driver-side single values."""
    return round6(pa.array([float(x)], pa.float64()))[0].as_py()
