"""sf1.0 extraction bench (r3 VERDICT #4): 3,000,000 pages — one order
of magnitude above the per-round sf0.1 bench — to show the headline
extraction throughput holds as data grows 10x (the plan is map-only
with zero shuffle, so wall time should scale ~linearly in rows).

Appends a markdown section to BENCH/EXTRA.md and prints one JSON line.
The 3M-page corpus (~15 GiB) is generated once and cached; pass
BIG_KEEP=0 to delete it afterwards (disk-friendly).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BIG_PAGES", "3000000"))

    from powerpoint_context_extractor_spark.operators.extract import (
        extract_pages,
    )
    from powerpoint_context_extractor_spark.session import get_spark
    from powerpoint_context_extractor_spark.sources.pagegen import (
        ensure_pages_dataset,
    )

    spark = get_spark("pcx-big", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    pages_dir = os.path.join(REPO, ".bench_cache", "pages_sf1.0_v5")
    t0 = time.monotonic()
    ensure_pages_dataset(spark, pages_dir, n_pages, min_paras=10,
                         max_paras=60, num_files=cpus * 8)
    gen_sec = round(time.monotonic() - t0, 1)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "16k")
    pages = spark.read.parquet(pages_dir)

    runs = []
    for _ in range(2):
        t = time.monotonic()
        n_ok = extract_pages(pages).filter("error is null").count()
        runs.append(round(time.monotonic() - t, 1))
    sec = min(runs)
    dps = round(n_pages / sec, 1)
    result = {"metric": "sf1.0_extract", "n_pages": n_pages, "cpus": cpus,
              "sec_best": sec, "all_sec": runs, "docs_per_sec": dps,
              "n_ok": n_ok, "gen_sec": gen_sec}
    print(json.dumps(result))

    md = f"""## sf1.0 extraction ({n_pages:,} pages, local[{cpus}])

| rows | wall sec (best of {len(runs)}) | docs/sec | ok rows |
|---|---|---|---|
| {n_pages:,} | {sec} | {dps:,.0f} | {n_ok:,} |

10x the per-round sf0.1 bench input on the identical map-only plan
(zero shuffle; scan parallelism from file splits). All runs: {runs}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "EXTRA.md"), "a",
              encoding="utf-8") as f:
        f.write(md + "\n")
    spark.stop()
    if os.environ.get("BIG_KEEP", "1") == "0":
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
