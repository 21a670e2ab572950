"""Pre-validate the driver contract: run every queries()[k] on Spark at
sf0.01 and diff against oracle_sql()[k] via DuckDB — row count, sorted
column names, and the driver's value canonicalization.

IMPORTANT (round-1 lesson): this mirrors the driver's *pandas* path —
DuckDB ``fetchdf()`` and Spark ``toPandas()``, columns sorted by name,
rows sorted with ``sort_values``, every cell stringified with ``str``.
Round 1 used ``fetchall()`` (HUGEINT -> Python int) and falsely passed
8 queries whose DuckDB SUM(BIGINT) came back as HUGEINT -> float64
("123.0" vs "123") under the driver's fetchdf. Do not "improve" this
back to typed comparison.

Usage: python scripts/check_entry.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df):
    """Driver-shaped canonicalization: sorted columns, sort_values over
    all columns (crashes on unhashable cells — by design, the driver
    does too), then str() every cell."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return [tuple(str(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entry_mod
    from powerpoint_context_extractor_spark.session import get_spark

    spark = get_spark("check-entry", master="local[8]", shuffle_partitions=8,
                      driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            # still exercise the driver's canonicalizer (catches
            # unhashable columns like array<double> even rows-only)
            try:
                _canon(spdf)
                print(f"ok?  {name}: rows={len(spdf)} (rows-only, no oracle)")
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: canonicalizer would crash: {exc}")
                failures.append(name)
            continue
        try:
            opdf = con.sql(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        dt = time.monotonic() - t0
        problems = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"cols spark={sorted(spdf.columns)} "
                            f"duck={sorted(opdf.columns)}")
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(opdf)}")
        if not problems:
            try:
                a = _canon(spdf)
                b = _canon(opdf)
            except Exception as exc:  # noqa: BLE001
                problems.append(f"canonicalizer crash: {exc}")
            else:
                if a != b:
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(spdf)} ({dt:.1f}s)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
