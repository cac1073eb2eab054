"""Round-11 pins: adversarial-input contracts (VERDICT r10 'do this').

The big one is the gap-filling grid clamp — the r10 adversarial gate
HUNG in feature_resample_1h because one epoch/far-future timestamp per
user made the per-user hourly grid span centuries (~2M rows/user). The
clamp bounds generated rows by CONFIGURATION (median-anchored half
span), quarantines observed out-of-range buckets (emitted verbatim, no
synthetic gap rows), and leaves in-bounds data byte-identical. At
100 TB a corrupt timestamp per key is a certainty, so the row budget
must be enforced, not assumed.

Also pinned here: the vector-validity contract shared by the sim
family, NULL-key PIT lookups, the NULL-safe Misra-Gries kernel, the
base64-armored line codec, and the NULL-clip pandas UDF contract.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.operators.rolling import (
    DENSIFY_HALF_SPAN_DAYS,
    RESAMPLE_HALF_SPAN_HOURS,
    densify_daily_spine,
    feature_resample_1h,
)

TS = datetime.datetime


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v double"
    )


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_resample_grid_is_span_clamped_with_outlier_quarantine(
    spark, tmp_path
):
    # user 1: a normal 3-hour cluster plus one epoch and one far-future
    # outlier. Unclamped, the grid would span 1970..2199 (~2M rows).
    rows = [
        (1, 1, "view", TS(2024, 1, 10, 10, 5), 1.0, "{}"),
        (2, 1, "view", TS(2024, 1, 10, 12, 55), 2.0, "{}"),
        (3, 1, "view", TS(1970, 1, 1, 0, 0), 3.0, "{}"),
        (4, 1, "view", TS(2199, 12, 31, 23, 59), 4.0, "{}"),
        (5, None, "view", TS(2024, 1, 10, 11, 0), 9.0, "{}"),  # keyless
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = feature_resample_1h(spark, sf).collect()

    budget = 1 * (2 * RESAMPLE_HALF_SPAN_HOURS + 1) + 2  # + outlier hours
    assert len(out) <= budget
    # NULL user_id excluded entirely
    assert all(r["user_id"] is not None for r in out)
    # quarantined outlier hours ARE present, verbatim
    hbs = {r["hb"] for r in out}
    assert TS(1970, 1, 1, 0, 0) in hbs
    assert TS(2199, 12, 31, 23, 0) in hbs
    # the in-cluster gap (10:00..12:00) is densified with carry-forward
    by_hb = {r["hb"]: r for r in out}
    gap = by_hb[TS(2024, 1, 10, 11, 0)]
    assert gap["n_events"] == 0
    # carry-forward: epoch outlier (3.0) filled forward into the gap
    # until 10:00's own value (1.0) takes over
    assert gap["filled_value"] == 1.0


def test_resample_unclamped_domain_is_byte_identical(spark, tmp_path):
    # span < half_span: clamp must not bind — plain dense grid
    rows = [
        (1, 7, "view", TS(2024, 1, 1, 0, 10), 1.0, "{}"),
        (2, 7, "view", TS(2024, 1, 1, 5, 50), 2.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = sorted(feature_resample_1h(spark, sf).collect(), key=lambda r: r["hb"])
    assert [r["hb"].hour for r in out] == [0, 1, 2, 3, 4, 5]
    assert [r["n_events"] for r in out] == [1, 0, 0, 0, 0, 1]


def test_densify_spine_is_span_clamped(spark, tmp_path):
    rows = [
        (1, 1, "purchase", TS(2024, 1, 10), 10.0, "{}"),
        (2, 1, "purchase", TS(2024, 1, 20), 20.0, "{}"),
        (3, 2, "purchase", TS(1970, 1, 1), 30.0, "{}"),      # epoch outlier
        (4, 2, "purchase", TS(2024, 1, 15), 40.0, "{}"),
        (5, 3, "purchase", TS(2199, 12, 31), 50.0, "{}"),    # future outlier
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = densify_daily_spine(spark, sf).collect()
    budget = 3 * (2 * DENSIFY_HALF_SPAN_DAYS + 1) + 2
    assert len(out) <= budget
    # quarantined cells kept with exact values
    cells = {(r["user_id"], str(r["day"])): r for r in out}
    assert cells[(2, "1970-01-01")]["sum_value_cents"] == 3000
    assert cells[(3, "2199-12-31")]["sum_value_cents"] == 5000
    # zero-fill present inside the clamped span
    assert cells[(1, "2024-01-15")]["n_purchases"] == 0


def test_sim_family_excludes_degenerate_vectors(spark, tmp_path):
    from databricks_feature_store_poc_spark.llm.similarity import (
        DIM,
        sim_cosine_topk,
    )

    rows = []
    for vid in range(12):
        rows.append((vid, [float(vid + d) for d in range(DIM)], vid % 3))
    rows.append((12, None, 0))                      # NULL vector
    rows.append((13, [0.0] * DIM, 1))               # zero norm
    rows.append((14, [1.0] * (DIM - 4), 2))         # ragged
    df = spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = sim_cosine_topk(spark, str(tmp_path)).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert ids and not ids & {12, 13, 14}
    assert all(r["cosine"] == r["cosine"] for r in out)  # no NaN


def test_pit_lookup_null_keys_match_nothing(spark):
    from databricks_feature_store_poc_spark.featurestore.lookup import (
        FeatureLookup,
        apply_lookup,
    )

    versions = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 10.0), (None, TS(2024, 1, 1), 99.0)],
        "uid long, fts timestamp, bal double",
    )
    spine = spark.createDataFrame(
        [(100, 1, TS(2024, 1, 2)), (101, None, TS(2024, 1, 2))],
        "event_id long, uid long, ts timestamp",
    )
    lk = FeatureLookup(
        table_name="v",
        feature_names=("bal",),
        lookup_key=("uid",),
        spine_keys=("uid",),
        timestamp_lookup_key=("ts", "fts"),
    )
    out = {r["event_id"]: r["bal"] for r in apply_lookup(spine, versions, lk).collect()}
    assert out[100] == 10.0
    assert out[101] is None  # NULL key: no match, no carried value


def test_misra_gries_kernel_counts_null_keys(spark, tmp_path):
    from databricks_feature_store_poc_spark.operators.analytics import (
        agg_heavy_hitters,
    )

    rows = []
    eid = 0
    for _ in range(200):  # NULL-key group: clear heavy hitter
        rows.append((eid, None, "view", TS(2024, 1, 1, 0, 0), 1.0, "{}"))
        eid += 1
    for u in range(50):  # light tail
        rows.append((eid, u, "view", TS(2024, 1, 1, 0, 0), 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = agg_heavy_hitters(spark, sf).collect()
    null_rows = [r for r in out if r["user_id"] is None]
    assert len(null_rows) == 1 and null_rows[0]["cnt"] == 200


def test_text_line_codec_roundtrips_crlf_tab_null(spark, tmp_path):
    from databricks_feature_store_poc_spark.operators.zorder import (
        scan_text_lines,
    )

    texts = [
        (0, "plain ascii"),
        (1, "tab\there and\r\ncrlf line"),
        (2, ""),
        (3, None),
        (4, "unicode 🚀 naïve " + "x" * 300),  # > one base64 MIME chunk
    ]
    spark.createDataFrame(texts, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r["text"] for r in scan_text_lines(spark, str(tmp_path)).collect()}
    assert out == dict(texts)


def test_udf_scalar_null_clips_to_null(spark, tmp_path):
    from databricks_feature_store_poc_spark.functions.scalar import udf_scalar

    rows = [
        (0, None, "view", TS(2024, 1, 1), None, "{}"),
        (1, 1, "view", TS(2024, 1, 1), -5.0, "{}"),
        (2, 1, "view", TS(2024, 1, 1), 99.0, "{}"),
    ]
    sf = _write_events(
        spark,
        tmp_path,
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
    )
    out = {r["event_id"]: r["clipped"] for r in udf_scalar(spark, sf).collect()}
    assert out[0] is None
    assert out[1] == 0.0
    assert out[2] == 50.0


def test_versioned_two_writer_race_first_wins_cleanly(spark, tmp_path, monkeypatch):
    """Two writers racing on the same next version (r9 carryover #7):
    the snapshot directory is the lock — `errorifexists` makes the
    SECOND writer fail cleanly, and the manifest still lists the
    winner's version exactly once (no corruption, no double entry)."""
    from databricks_feature_store_poc_spark.featurestore.versioned import (
        VersionedFeatureTable,
    )

    vt_a = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt_b = VersionedFeatureTable(spark, str(tmp_path), "feat")
    vt_a.write(_df(spark, [1.0]), timestamp=100.0)

    # B resolves the manifest BEFORE A's second write lands (stale read),
    # so both compute version=2
    stale = vt_b._read_manifest()
    vt_a.write(_df(spark, [2.0]), timestamp=200.0)  # A wins version 2

    monkeypatch.setattr(
        VersionedFeatureTable, "_read_manifest",
        lambda self: [dict(e) for e in stale],
    )
    with pytest.raises(Exception):  # loser: path already exists
        vt_b.write(_df(spark, [9.0]), timestamp=300.0)
    monkeypatch.undo()

    hist = vt_a.history()
    assert [e["version"] for e in hist] == [1, 2]
    assert vt_a.read(version=2).collect()[0]["v"] == 2.0


def test_fault_injection_gate_passes():
    """Retry-determinism gate (r9 carryover #6): kernels are pure
    functions of their input partition, so a first-attempt task failure
    (and the retry it triggers) cannot change any output. Runs the
    scripted gate's injection + exactly-once checks on a retry-enabled
    local[8,3] session in a subprocess (task retries are a context-level
    setting the shared test session can't carry)."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "scripts/fault_injection_gate.py"],
        cwd="/root/repo", text=True, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    assert p.returncode == 0, p.stdout[-2000:]


def test_session_timezone_repinned_to_utc_on_driver_sessions(spark):
    """Timezone contract (r9 carryover #5, investigated r11): the corpus
    stores TIMESTAMP(MICROS, isAdjustedToUTC=false) — LOCAL wall-clock
    semantics. Spark reads them as TIMESTAMP_LTZ (unix_micros and range
    frames need it), so only under a UTC session timezone do instant and
    wall-clock coincide and both engines compute identical dates,
    windows, and epochs. A probe run under America/New_York shifts every
    rendered timestamp by the zone offset (the expected LTZ behavior,
    not a computational bug), so non-UTC sessions are OUT of the
    cross-engine-parity contract — and the engine ENFORCES the pin:
    ensure_session_confs (the driver entry path) repins UTC on any
    externally-created session."""
    from databricks_feature_store_poc_spark.session import (
        ensure_session_confs,
    )

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ensure_session_confs(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
