"""Round-13 pins (VERDICT r12 'do this' + ADVICE r12).

- ADVICE r12 #4: the r12 resample test only exercised the span-probe
  FAST path; neither the clamp branch nor the claimed fast==clamp
  equivalence was tested. Pinned here both ways: (a) an out-of-span
  dataset drives the percentile clamp branch and asserts the outlier
  quarantine contract (no synthetic grid rows around the outlier, the
  outlier hour emitted verbatim); (b) the two formulations are run on
  the SAME in-span data (the clamp branch forced via a lowered
  half-span that still does not bind) and compared row-for-row.
- Hot-dup axis contracts (VERDICT r12 #2) are pinned as they are
  adjudicated; see ROUND13_NOTES.md.
"""

from __future__ import annotations

import datetime

TS = datetime.datetime


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_resample_clamp_branch_quarantines_outlier(spark, tmp_path):
    """Span > (half-1)h trips the probe; the median-anchored clamp must
    bound the grid at med+half and emit the far outlier verbatim with
    NO synthetic gap rows generated around it."""
    from databricks_feature_store_poc_spark.operators import rolling

    half = rolling.RESAMPLE_HALF_SPAN_HOURS  # 2196 (±91.5 days)
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1, "view", TS(2024, 1, 1, 10, 5), 1.0, "{}"),
            (2, 1, "view", TS(2024, 1, 1, 11, 30), 2.0, "{}"),
            # ~152 days later (3637h > half-1 = 2195h): probe trips
            (3, 1, "view", TS(2024, 6, 1, 0, 10), 7.0, "{}"),
        ],
    )
    rows = {
        r["hb"]: (r["n_events"], r["filled_value"])
        for r in rolling.feature_resample_1h(spark, sf).collect()
    }
    lo = TS(2024, 1, 1, 10)               # min observed hour
    med = TS(2024, 1, 1, 11)              # percentile_disc(0.5) of 3 hours
    hi = med + datetime.timedelta(hours=half)   # clamp binds (< max hb)
    outlier = TS(2024, 6, 1, 0)
    # grid = [lo, hi] hourly + the quarantined outlier hour, nothing else
    assert len(rows) == (hi - lo) // datetime.timedelta(hours=1) + 1 + 1
    assert min(rows) == lo and max(rows) == outlier
    grid_hours = sorted(h for h in rows if h != outlier)
    assert grid_hours[-1] == hi  # no synthetic rows past the clamp
    # observed hours exact; gap hours forward-filled
    assert rows[lo] == (1, 1.0)
    assert rows[med] == (1, 2.0)
    assert rows[TS(2024, 1, 1, 12)] == (0, 2.0)
    assert rows[hi] == (0, 2.0)
    # the outlier is emitted verbatim (exact aggregate, fill intact)
    assert rows[outlier] == (1, 7.0)


def test_resample_fast_path_equals_clamp_path_rowwise(spark, tmp_path):
    """The probe's claim: when no user's span exceeds half the window,
    skipping the median pass changes NOTHING. Run the same in-span data
    through both branches (clamp branch forced via a lowered half-span
    chosen so the probe trips but the clamp still cannot bind) and
    assert row-level equality."""
    from databricks_feature_store_poc_spark.operators import rolling

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1, "view", TS(2024, 1, 10, 10, 5), 1.0, "{}"),
            (2, 1, "view", TS(2024, 1, 10, 14, 55), 2.0, "{}"),
            (3, 2, "view", TS(2024, 1, 11, 3, 0), 4.0, "{}"),
            (4, 2, "view", TS(2024, 1, 11, 9, 40), 8.0, "{}"),
        ],
    )

    def run():
        return sorted(
            (r["user_id"], r["hb"], r["n_events"], r["filled_value"])
            for r in rolling.feature_resample_1h(spark, sf).collect()
        )

    fast = run()  # global span ~17h << (2196-1)h: probe short-circuits
    orig = rolling.RESAMPLE_HALF_SPAN_HOURS
    # half=12: probe threshold (half-1)=11h < 17h global span -> median
    # pass runs; per-user spans (5h, 7h) <= 2*half so lo=mn, hi=mx for
    # every user -> the clamp provably does not bind.
    rolling.RESAMPLE_HALF_SPAN_HOURS = 12
    try:
        clamped = run()
    finally:
        rolling.RESAMPLE_HALF_SPAN_HOURS = orig
    assert fast == clamped


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def _vec(seed, dim=64):
    # deterministic, distinct directions per seed
    return [float((seed * 31 + d * 7) % 13 - 6) / 6.0 for d in range(dim)]


def test_hard_negatives_tie_order_total_under_dup_ids(spark, tmp_path):
    """Two copies of candidate id 5 carry BYTE-IDENTICAL vectors but
    different labels: the (cos, id) order ties, so the r13 (cos, id,
    label) order must pick the smaller label deterministically — the
    hotdup replica caught Spark and DuckDB picking different copies.

    The fixture puts the tie AT THE TOP_K CUT (four higher-cosine
    fillers occupy ranks 1-4, the two id-5 copies compete for rank 5),
    so the assertion is on WHICH copy survives — an output-SET
    property, immune to collect() row order (ADVICE r13)."""
    from databricks_feature_store_poc_spark.llm.similarity import (
        TOP_K,
        sample_hard_negatives,
    )

    assert TOP_K == 5, "fixture assumes 4 fillers + 1 contested slot"
    rows = [(0, _vec(1), 0)]                      # the query (label 0)
    # ranks 1-4: label-2 fillers colinear with the query (cosine 1.0)
    rows += [(i, _vec(1), 2) for i in range(10, 14)]
    # the contested rank-5 slot: identical dup copies of candidate 5
    # (same vector, same cosine < 1.0) differing ONLY in label
    rows += [(5, _vec(2), 3), (5, _vec(2), 1)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = sample_hard_negatives(spark, sf).collect()
    five = [r for r in out if r["query_id"] == 0 and r["negative_id"] == 5]
    # exactly ONE copy survives the cut, and ties ascend on label — the
    # pre-r13 (cos, id) order left the surviving label engine-arbitrary
    assert len(five) == 1
    assert five[0]["negative_label"] == 1
    assert len([r for r in out if r["query_id"] == 0]) == TOP_K


def test_recall_audit_is_set_metric_under_dup_ids(spark, tmp_path):
    """One query id duplicated with near-identical vectors: the audit
    must emit ONE row per distinct query id with k = distinct exact
    neighbors (pre-r13 the pair join fanned multiplicatively)."""
    from databricks_feature_store_poc_spark.llm.similarity import (
        sim_ann_lsh,
        sim_mmr_diversify,
    )

    rows = [(0, _vec(1), 0), (0, [x * 1.01 for x in _vec(1)], 5)]
    rows += [(1, _vec(2), 0)]
    rows += [(i, _vec(i), 0) for i in range(20, 40)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = sim_ann_lsh(spark, sf).collect()
    by_q = {r["query_id"]: r for r in out}
    assert sorted(by_q) == [0, 1]          # one row per DISTINCT id
    assert all(r["k"] <= 5 for r in out)   # distinct-neighbor k

    # MMR: the duplicated anchor collapses to one representative row,
    # so the pool is the 21 non-anchor ids and 8 distinct picks emerge
    mmr = sim_mmr_diversify(spark, sf).collect()
    assert len(mmr) == 8
    assert len({r["vec_id"] for r in mmr}) == 8
