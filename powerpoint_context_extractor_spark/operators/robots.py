"""robots.txt disallow filtering — crawl politeness applied corpus-side
(drop pages a well-behaved fetcher should never have kept).

Contract subset (frozen for the oracle): bodies are the ``User-agent: *``
group's ``Disallow:`` lines; a page is blocked when any non-empty rule
is a PREFIX of its path. Rule extraction and the prefix probe are pure
array HOFs (filter/transform/exists) — JVM codegen end to end; the
rules table is tiny (one row per host) so the pages join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_disallow_rules(robots: DataFrame, host_col: str = "host",
                         body_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, rules array<string>): the trimmed
    'Disallow: ' targets, empty rules (allow-all markers) removed."""
    lines = F.split(F.col(body_col), "\n")
    dis = F.filter(lines, lambda ln: ln.startswith("Disallow: "))
    rules = F.filter(
        F.transform(dis,
                    lambda ln: F.trim(ln.substr(F.lit(11), F.length(ln)))),
        lambda r: r != "")
    return robots.select(F.col(host_col), rules.alias("rules"))


def apply_robots(pages: DataFrame, robots: DataFrame,
                 host_col: str = "host",
                 path_col: str = "path") -> DataFrame:
    """Left-broadcast-join pages to per-host rules; ``allowed`` = 1 iff
    no rule prefixes the path (hosts without robots allow everything)."""
    rules = parse_disallow_rules(robots, host_col)
    joined = pages.join(F.broadcast(rules), host_col, "left")
    blocked = F.exists(
        F.coalesce(F.col("rules"), F.array().cast("array<string>")),
        lambda r: F.col(path_col).startswith(r))
    return joined.withColumn(
        "allowed", (~blocked).cast("long")).drop("rules")
