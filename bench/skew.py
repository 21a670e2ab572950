"""Skew bench (SURVEY §7 step 6): the bulk corpus gives ONE host ~30%
of all urls (Zipf head — the realistic Common-Crawl shape). This
measures what the engine's hash(url) spread buys versus the
anti-pattern of partitioning the extraction input by host:

* partition-by-host: the hot host's partition carries ~30% of the rows
  -> one straggler task bounds the stage.
* repartition_for_extract (hash(url)): urls are unique, so partitions
  fill uniformly regardless of host skew; stragglers stay bounded.

Appends a markdown section to BENCH/EXTRA.md (picked up by
scripts/compose_baseline.py) and prints one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SKEW_PAGES", "300000"))

    from pyspark.sql import functions as F

    from powerpoint_context_extractor_spark.operators.extract import (
        extract_pages, repartition_for_extract,
    )
    from powerpoint_context_extractor_spark.session import get_spark
    from powerpoint_context_extractor_spark.sources.pagegen import (
        ensure_pages_dataset,
    )

    spark = get_spark("pcx-skew", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    pages_dir = os.path.join(REPO, ".bench_cache", "pages_sf0.1_v5")
    ensure_pages_dataset(spark, pages_dir, n_pages, min_paras=10,
                         max_paras=60, num_files=cpus * 4)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "16k")
    pages = spark.read.parquet(pages_dir)
    host = F.regexp_extract("url", r"^https?://([^/]+)/", 1)

    def fill_stats(df) -> dict:
        cnts = [r["n"] for r in df.select(F.spark_partition_id().alias("p"))
                .groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()]
        return {"parts": len(cnts), "max_rows": max(cnts),
                "mean_rows": sum(cnts) // len(cnts),
                "max_over_mean": round(max(cnts) / (sum(cnts) / len(cnts)), 2)}

    def run(df) -> float:
        t = time.monotonic()
        df.count()
        return round(time.monotonic() - t, 2)

    by_host = extract_pages(
        pages.repartition(cpus, host)).filter("error is null")
    by_hash = extract_pages(
        repartition_for_extract(pages, cpus)).filter("error is null")

    arms = {"by_host": by_host, "by_hash_url": by_hash}
    stats = {k: fill_stats(pages.repartition(cpus, host)
                           if k == "by_host"
                           else repartition_for_extract(pages, cpus))
             for k in arms}
    secs: dict = {k: [] for k in arms}
    for _ in range(2):                 # alternate arms to average host noise
        for k, df in arms.items():
            secs[k].append(run(df))
    best = {k: min(v) for k, v in secs.items()}
    result = {"metric": "skew_bench", "n_pages": n_pages, "cpus": cpus,
              "best_sec": best, "all_sec": secs, "fill": stats}
    print(json.dumps(result))

    md = f"""## Skew bench (hot host = ~30% of rows, {n_pages:,} pages, local[{cpus}])

| extraction input partitioning | partition fill max/mean | wall sec (best of 2) |
|---|---|---|
| by host (anti-pattern) | {stats['by_host']['max_over_mean']}x (max {stats['by_host']['max_rows']:,} rows) | {best['by_host']} |
| hash(url) — `repartition_for_extract` | {stats['by_hash_url']['max_over_mean']}x (max {stats['by_hash_url']['max_rows']:,} rows) | {best['by_hash_url']} |

urls are unique, so hash(url) fills partitions uniformly no matter how
skewed hosts are; the hot-host partition under by-host partitioning
carries ~30% of all rows and its single task bounds the stage. (The
default flagship path needs NO repartition at all — scan splits are
already uniform; this bench isolates the spread operator itself.)
All runs: {json.dumps(secs)}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "EXTRA.md"), "a",
              encoding="utf-8") as f:
        f.write(md + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
