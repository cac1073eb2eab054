"""Online point-lookup emulation (reference J2).

The reference serves feature tables through Databricks online tables with
<10 ms retrieval (README.md:91-94,110,115; lookup_mode 'online' at
02_model_training.py:77). Open-source Spark has no serving path — a Spark
job per lookup is milliseconds-to-seconds of scheduling overhead — so this
module emulates the semantics: materialize the (small, dimension-sized)
feature table once into a local dict and serve point lookups from memory.
Semantically this is J1 with a 1-row spine.

Scale note (SURVEY.md §7 hard parts): this is an explicit, documented gap —
a production deployment would sync the table to an external KV store
(Redis/Cassandra); the collect here is guarded by a row-count cap so nobody
accidentally collects a 100 TB table onto the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class OnlineStore:
    """In-memory key -> feature-row view of a feature table."""

    DEFAULT_MAX_ROWS = 5_000_000

    def __init__(self, key_cols: list[str], feature_cols: list[str], data: dict):
        self.key_cols = key_cols
        self.feature_cols = feature_cols
        self._data = data

    @classmethod
    def from_table(
        cls,
        df: DataFrame,
        primary_keys: list[str],
        feature_names: list[str] | None = None,
        max_rows: int = DEFAULT_MAX_ROWS,
    ) -> "OnlineStore":
        feats = feature_names or [c for c in df.columns if c not in primary_keys]
        narrowed = df.select(*primary_keys, *feats)
        # Single pass: enforce the cap while streaming rows to the driver
        # instead of a separate count() job (which would re-run the whole
        # upstream pipeline — 2x cost on a recomputed feature table).
        data = {}
        for row in narrowed.toLocalIterator():
            if len(data) >= max_rows:
                raise ValueError(
                    f"refusing to collect more than {max_rows} rows into an "
                    "online store; sync to an external KV store instead"
                )
            key = tuple(row[k] for k in primary_keys)
            data[key] = {f: row[f] for f in feats}
        return cls(list(primary_keys), list(feats), data)

    def lookup(self, *key) -> dict | None:
        """Point lookup; returns None for a missing key (left-join NULLs)."""
        return self._data.get(tuple(key))

    def __len__(self) -> int:
        return len(self._data)
