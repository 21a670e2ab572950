"""32-wide fixed-cost experiments (r4 VERDICT #9).

At local[32] on the 300k-page corpus, Spark held 48% of the raw-kernel
ceiling in round 3 (fixed per-pass costs dominate a ~9s wall). This
harness A/B-tests the candidate levers in fresh pinned JVMs on the SAME
cached corpus — python worker reuse (audit: confirm the default is on
and measure the cost of it being off), Arrow batch byte sizing, scan
split sizing — and prints docs/s plus share-of-ceiling per variant.

Never run concurrently with other Spark work (host noise contaminates —
BENCH/BASELINE.md method notes).

Usage: python bench/width32.py [--cores 32] [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
conf_extra = json.loads(sys.argv[3])
from powerpoint_context_extractor_spark.session import get_spark
from powerpoint_context_extractor_spark.operators.extract import extract_pages
cores = int(sys.argv[1]); pages_dir = sys.argv[2]
kw = {{}}
if "arrow_bytes" in conf_extra:
    kw["arrow_bytes"] = conf_extra.pop("arrow_bytes")
mpb = conf_extra.pop("maxPartitionBytes", "4m")
spark = get_spark("w32", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, extra_conf=conf_extra, **kw)
spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
spark.conf.set("spark.sql.files.openCostInBytes", "16k")
pages = spark.read.parquet(pages_dir)
n = pages.count()
extract_pages(pages).filter("error is null").count()   # warm-up
times = []
for _ in range(int(sys.argv[4])):
    t0 = time.monotonic()
    ok = extract_pages(pages).filter("error is null").count()
    times.append(time.monotonic() - t0)
dt = min(times)
print(json.dumps({{"n": n, "sec": dt,
                   "all_secs": [round(t, 2) for t in times],
                   "docs_per_sec": n / dt}}))
spark.stop()
"""

VARIANTS = {
    # r3 production config (the baseline to beat)
    "baseline-16m": {},
    # worker-reuse AUDIT: reuse is Spark's default; measure the cost of
    # turning it OFF to prove the default is load-bearing at 32-wide
    "reuse-off": {"spark.python.worker.reuse": "false"},
    # Arrow batch bytes around the current 16m
    "arrow-8m": {"arrow_bytes": "8m"},
    "arrow-24m": {"arrow_bytes": "24m"},
    # scan split sizing (more/fewer tasks -> scheduler amortization)
    "split-2m": {"maxPartitionBytes": "2m"},
    "split-8m": {"maxPartitionBytes": "8m"},
    # no locality wait (local mode: pure scheduler latency)
    "locality-0": {"spark.locality.wait": "0s"},
}


def run_variant(name: str, conf: dict, cores: int, pages_dir: str,
                passes: int) -> dict:
    script = CHILD.format(repo=REPO)
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", script,
           str(cores), pages_dir, json.dumps(conf), str(passes)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         timeout=1800)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--pages-dir",
                    default=os.path.join(REPO, ".bench_cache",
                                         "pages_scaling_v5"))
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--skip-ceiling", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    ceiling = None
    if not args.skip_ceiling:
        sys.path.insert(0, os.path.join(REPO, "bench"))
        from scaling import measure_ceiling
        ceiling = measure_ceiling(args.cores, args.pages_dir)
        print(f"raw-kernel ceiling local[{args.cores}]: {ceiling:.0f} docs/s",
              flush=True)

    results = {}
    for name in args.variants:
        r = run_variant(name, dict(VARIANTS[name]), args.cores,
                        args.pages_dir, args.passes)
        results[name] = r
        share = f" ({r['docs_per_sec'] / ceiling:.0%} of ceiling)" \
            if ceiling else ""
        print(f"{name:14s}: {r['docs_per_sec']:.0f} docs/s "
              f"min={r['sec']:.2f}s all={r['all_secs']}{share}", flush=True)

    with open(os.path.join(REPO, "BENCH", "width32.jsonl"), "a",
              encoding="utf-8") as f:
        from datetime import datetime, timezone
        stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
        for name, r in results.items():
            f.write(json.dumps({"ts": stamp, "variant": name,
                                "cores": args.cores,
                                "ceiling": ceiling, **r}) + "\n")


if __name__ == "__main__":
    main()
