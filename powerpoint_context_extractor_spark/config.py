"""Layered JSON config with dot-path access — the Spark-side analog of
the reference's config system (`pptx_extractor/config.py:26-108`:
cwd -> project -> home lookup order, dot-path get/set, defaults merge).

Engine knobs (shuffle partitions, Arrow batch, split sizes) flow into
``session.get_spark`` / ``spark.conf``; pipeline knobs (error policy,
salting, thresholds) are read by the plans.
"""

from __future__ import annotations

import json
import os
from typing import Any

DEFAULTS: dict = {
    "extract": {
        "continue_on_row_failure": True,   # reference: error_handling.*
        "arrow_batch_rows": 512,
        "max_partition_bytes": "128m",
    },
    "dedup": {
        "minhash_threshold_bp": 8000,
        "shingle_k": 3,
    },
    "resume": {"enabled": True},
    "lineage": {"enabled": True},
}

CONFIG_NAME = "pcx_config.json"


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class Config:
    """Layered lookup: explicit path > cwd > repo root > $HOME."""

    def __init__(self, explicit_path: str | None = None) -> None:
        self.path = self._find(explicit_path)
        data: dict = {}
        if self.path and os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                data = json.load(f)
        self.data = _deep_merge(DEFAULTS, data)

    @staticmethod
    def _find(explicit: str | None) -> str | None:
        if explicit:
            return explicit
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for d in (os.getcwd(), here, os.path.expanduser("~")):
            p = os.path.join(d, CONFIG_NAME)
            if os.path.exists(p):
                return p
        return None

    def get(self, dotted: str, default: Any = None) -> Any:
        cur: Any = self.data
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        cur = self.data
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
