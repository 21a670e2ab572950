"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decode/feature-extract as Arrow-batched stubs.

The image/audio libraries are not in this container, so the *decoders*
are deterministic stubs behind a clearly-marked seam — but everything
Spark-side is real and tested: schemas, the binary column path through
parquet, mapInPandas batch shapes, and the metadata functions (which
are pure built-ins and DuckDB-oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_KINDS = {
    "89504e47": "png", "ffd8ffe0": "jpeg", "25504446": "pdf",
    "2557444f": "wdoc",  # "%WDO" — our layout container prefix
}


def binary_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins
    (length, magic hex prefix, sha256), fully oracle-checkable."""
    b = F.col(bin_col)
    magic = F.lower(F.hex(F.substring(b, 1, 4)))
    return df.select(
        F.col(id_col),
        F.length(b).cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
        F.sha2(b, 256).alias("payload_sha"))


FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
    T.StructField("error", T.StringType()),
])


def _decode_stub(payload: bytes) -> list:
    """STUB decoder. A real deployment plugs Pillow/torchaudio/ffmpeg in
    here; this container has none, so we emit a deterministic
    byte-statistics vector with the same shape contract (fixed-length
    array<double>). Raises on empty payloads to exercise the error
    path."""
    if not payload:
        raise ValueError("empty payload")
    n = len(payload)
    return [float(n), float(payload[0]), float(payload[-1]),
            float(sum(payload[:64]) % 997)]


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "kind", "n_bytes", "features", "error")}
        for doc_id, payload in zip(pdf["doc_id"].tolist(), pdf["payload"].tolist()):
            raw = bytes(payload) if payload is not None else b""
            magic = raw[:4].hex()
            out["doc_id"].append(doc_id)
            out["kind"].append(MAGIC_KINDS.get(magic, "unknown"))
            out["n_bytes"].append(len(raw))
            try:
                out["features"].append(_decode_stub(raw))
                out["error"].append(None)
            except Exception as exc:  # noqa: BLE001 — log-and-continue
                out["features"].append(None)
                out["error"].append(f"{type(exc).__name__}: {exc}")
        yield pd.DataFrame(out)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads — the
    real Spark plumbing around the stubbed decoder."""
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       F.col(bin_col).alias("payload"))
    return narrow.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)
