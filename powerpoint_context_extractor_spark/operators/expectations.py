"""Data-quality expectation gate (the dbt-test / Great-Expectations
shape, public method): declared constraints checked corpus-wide in
ONE aggregation pass — the release gate a dataset pipeline runs
before publishing a snapshot.

Scale shape: every predicate rule compiles to a conditional-sum
aggregate and every uniqueness rule to ``count - count(distinct)``,
all in a single ``agg`` over one scan (distinct aggs ride Spark's
expand, the same documented cost as the data card); the result is a
tiny (rule, n_violations, passed) table. No row-level materialization
of violations — at 100 TB you gate first and sample offenders later
with the rule's predicate as a pushed-down filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: list,
                       unique_cols: list | None = None) -> DataFrame:
    """``rules`` = [(name, sql_predicate_that_must_hold)]; NULL
    predicate results count as violations. ``unique_cols`` adds
    per-column duplicate counts (rows beyond the first per value;
    NULLs are ignored by count(col) semantics, matching SQL UNIQUE).
    Emits (rule, n_violations, passed)."""
    unique_cols = list(unique_cols or [])
    if not rules and not unique_cols:
        raise ValueError("check_expectations: no rules given")
    aggs = []
    names = []
    for name, pred in rules:
        names.append(name)
        aggs.append(F.sum(
            F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1)
            .otherwise(0)).cast("long").alias(f"_r{len(names) - 1}"))
    for c in unique_cols:
        names.append(f"unique:{c}")
        aggs.append((F.count(F.col(c)) - F.countDistinct(F.col(c)))
                    .cast("long").alias(f"_r{len(names) - 1}"))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{n}', _r{i}" for i, n in enumerate(names))
    return (row.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)")
        .withColumn("passed",
                    (F.col("n_violations") == 0).cast("long")))
