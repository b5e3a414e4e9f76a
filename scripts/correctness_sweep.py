"""Local replica of the grading driver's correctness gate.

Runs every ``queries()`` entry at a given scale, and for entries with an
``oracle_sql()`` twin runs the SQL in DuckDB over the same parquet tables,
then compares row count, schema (column names), and a value hash computed
the driver's way: columns sorted by NAME, rows sorted, float values rounded.
Entries without an oracle get the driver's weaker rows-only check.

Usage:  python scripts/correctness_sweep.py [--sf-dir /root/testdata/sf0.01]
        [--only name1,name2] [--sample N --seed S]

``--sample N`` verifies a reproducible random slice of the registry (the
cheap re-audit mode for judges: same N+seed -> same slice).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_hash(df) -> str:
    """Driver-style value hash: columns sorted by name, rows sorted by every
    column, floats rounded to 6 significant-ish decimals, then md5."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if len(df) == 0 and len(df.columns) == 0:
        # Ray quirk: to_pandas() on a fully-empty Dataset drops columns
        # even though schema() knows them — rebuild from the schema so
        # the column compare stays meaningful on legitimately-empty
        # results (e.g. no pairs above threshold at this scale)
        schema = res.schema()
        if schema is not None and schema.names:
            df = pa.schema(
                list(zip(schema.names, schema.types))
            ).empty_table().to_pandas()
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="",
                    help="write the full per-query report as JSON (the "
                         "SWEEP_r{N}.json artifact the judge audits)")
    ap.add_argument("--sample", type=int, default=0,
                    help="verify only a random sample of N registry "
                         "entries (0 = all); reproducible via --seed")
    ap.add_argument("--seed", type=int, default=0,
                    help="RNG seed for --sample (same N+seed -> same "
                         "slice)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    import duckdb

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = E.queries()
    # pass the sweep's scale so the extraction oracles read THAT scale's
    # materialized goldens (the driver's no-arg call stays sf0.01)
    oracles = E.oracle_sql(args.sf_dir)
    only = {s for s in args.only.split(",") if s}
    if args.sample:
        import random
        names = sorted(queries)
        picked = random.Random(args.seed).sample(
            names, min(args.sample, len(names)))
        only = (only & set(picked)) if only else set(picked)
        print(f"sampling {len(only)} of {len(names)} queries "
              f"(seed={args.seed})")
        if not only:
            # --only disjoint from the sampled slice: an empty set would
            # read as "no filter" below and run the FULL registry — the
            # opposite of the requested restriction.  Exit cleanly.
            print(json.dumps({"failures": 0, "n": 0, "report": {}}))
            return 0

    report = {}
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        row = {}
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(args.sf_dir))
            row["rows"] = len(mine)
        except Exception as exc:  # noqa: BLE001 - report, don't crash sweep
            report[name] = {"err": f"query: {type(exc).__name__}: {exc}"}
            failures += 1
            print(f"ERR  {name}: {exc}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            row["check"] = "rows_only"
            status = "ok" if row["rows"] >= 0 else "fail"
        else:
            try:
                oracle = con.execute(sql).fetchdf()
            except Exception as exc:  # noqa: BLE001
                report[name] = {"err": f"oracle: {type(exc).__name__}: {exc}"}
                failures += 1
                print(f"ERR  {name} (oracle): {exc}", flush=True)
                continue
            row["oracle_rows"] = len(oracle)
            row["rows_match"] = len(mine) == len(oracle)
            row["schema_match"] = sorted(mine.columns) == sorted(oracle.columns)
            row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                 and canon_hash(mine) == canon_hash(oracle))
            status = "ok" if row["hash_match"] else "FAIL"
            if not row["hash_match"]:
                failures += 1
        row["sec"] = round(time.perf_counter() - t0, 2)
        report[name] = row
        print(f"{status:4s} {name}: {row}", flush=True)

    print(json.dumps({"failures": failures, "n": len(report)}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "failures": failures,
                       "n": len(report), "report": report}, f, indent=1)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
