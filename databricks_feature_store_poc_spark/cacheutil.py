"""Session-lifetime persisted-DataFrame memo (generalization of the ANN
index cache in llm/similarity.py, ADVICE-r5-hardened semantics).

Iterative operators (PageRank's edge list, k-means' quantized vectors)
reference the same derived DataFrame several times in one plan; without
persistence Spark re-derives it per reference. ``session_persist``
caches ONE persisted copy per (application, kind, source fingerprint):

- the source-file fingerprint (mtime_ns + size) invalidates the entry
  if the underlying parquet is regenerated in place;
- entries from stopped applications or stale fingerprints are
  unpersisted/evicted on the next touch, so the memo can't grow beyond
  one live entry per (kind, source) per process.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def source_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for src in paths:
        parts = [src]
        if os.path.isdir(src):
            parts = sorted(os.path.join(src, p) for p in os.listdir(src)) or [src]
        for p in parts:
            try:
                st = os.stat(p)
                h.update(f"{p}:{st.st_mtime_ns}:{st.st_size};".encode())
            except OSError:
                h.update(f"{p}:missing;".encode())
    return h.hexdigest()[:16]


def session_get(
    spark: SparkSession, kind: str, source_paths: list[str]
) -> DataFrame | None:
    """Peek the memo WITHOUT building anything: lets callers whose
    DataFrame construction is itself expensive (collect-driven fits)
    skip the construction when a live entry already exists. Returns
    None on miss or stale fingerprint (the next session_persist call
    evicts stale entries)."""
    key = (spark.sparkContext.applicationId, kind, source_fingerprint(source_paths))
    return _CACHE.get(key)


def session_persist(
    spark: SparkSession, kind: str, source_paths: list[str], df: DataFrame
) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, kind, source_fingerprint(source_paths))
    for k in [k for k in _CACHE if k != key and (k[0] != app or k[:2] == key[:2])]:
        try:
            _CACHE.pop(k).unpersist()
        except Exception:
            pass  # owning context already gone — the cache died with it
    if key not in _CACHE:
        _CACHE[key] = df.persist()
    return _CACHE[key]
