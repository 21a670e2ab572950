"""Join operators Spark lacks natively, composed from built-ins.

As-of join (time-series "latest right row at or before left ts"):
Spark has no ASOF JOIN; the standard scalable composition is
union-tag-window — one shuffle on (key), no per-group Python, no
crossJoin blowup. DuckDB *does* have ASOF JOIN, which makes this
operator directly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       ts: str, value_cols: list,
                       order_tiebreak: str | None = None) -> DataFrame:
    """For each left row: values of the latest right row with
    ``right.ts <= left.ts`` (inclusive) within the same ``key``.

    Composition: tag sides, union, window ``last(value, ignorenulls)``
    over (key) ordered by (ts, side) with right-before-left on ties so
    equal timestamps match. One hash shuffle on key; scales like any
    windowed agg (partition by key; skewed keys can be range-split by
    time first).
    """
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        tagged_l = tagged_l.withColumn(v, F.lit(None).cast(
            dict(right.dtypes)[v]))
    tagged_r = right.withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in right.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(
                dict(left.dtypes)[c]))
    u = tagged_l.select(*lcols, "_side", *value_cols).unionByName(
        tagged_r.select(*lcols, "_side", *value_cols))
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc_nulls_first())
    w = (W.partitionBy(key).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, 0))
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")
