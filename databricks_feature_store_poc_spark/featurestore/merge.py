"""Upsert (MERGE INTO) and SCD2 history maintenance without Delta.

Feature tables need keyed updates: refresh a user's features without
rewriting unrelated rows' semantics. Delta's MERGE INTO is not available
in this container, so both write patterns are emulated with pure
DataFrame algebra (per the classic anti-join + union formulation):

- ``merge_upsert``: last-write-wins upsert — matching target rows are
  replaced, new keys appended. One anti-join + one union; at scale the
  anti-join is a broadcast when the update batch is dimension-sized
  (the common feature-refresh shape), so the target scan stays map-only.
- ``scd2_apply``: slowly-changing-dimension type 2 — instead of
  overwriting, the current row is *closed* (valid_to = update time) and
  the new value appended as the open row. The resulting
  (key, valid_from, valid_to) history is exactly the versioned-rows
  shape `timestamp_lookup_key` point-in-time lookups consume — SCD2 on
  the write side and PIT joins on the read side are two halves of the
  same leakage-safety contract.

Both return new DataFrames (no in-place mutation); persist the result
via FeatureStore.create_table / VersionedFeatureTable.write — with
versioned snapshots, an upsert is write-isolated for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    *,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE INTO emulation: update matching keys, insert new ones.

    ``updates`` must be unique on ``keys`` (upsert batches are; enforce
    upstream with FeatureStore's PK gate) and share the target schema.
    """
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs "
            f"updates {sorted(updates.columns)}"
        )
    probe = updates.select(*keys)
    if broadcast_updates:
        probe = F.broadcast(probe)
    untouched = target.join(probe, on=keys, how="left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Fold an update batch into an SCD2 history.

    ``history`` carries (keys..., attributes..., valid_from, valid_to)
    with valid_to NULL on open rows; ``updates`` carries
    (keys..., attributes..., ts_col) — the change time. Open rows whose
    key is updated are closed at the update's time; each update becomes
    the new open row. Rows already closed are untouched (history is
    append/close-only — never rewritten).
    """
    upd_keyed = updates.select(
        *keys, F.col(ts_col).alias("__new_from")
    )
    b_upd = F.broadcast(upd_keyed)
    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    # Close open rows that have an update (valid_to = change time).
    newly_closed = (
        open_rows.join(b_upd, on=keys, how="inner")
        .withColumn(valid_to, F.col("__new_from"))
        .drop("__new_from")
    )
    still_open = open_rows.join(b_upd, on=keys, how="left_anti")

    # New open rows from the update batch.
    new_open = (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(history.schema[valid_to].dataType))
        .drop(ts_col)
    )
    return (
        closed_rows.unionByName(newly_closed)
        .unionByName(still_open)
        .unionByName(new_open.select(*closed_rows.columns))
    )
