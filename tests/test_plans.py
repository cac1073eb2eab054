"""Physical-plan shape assertions — the 100 TB contract, enforced in CI.

A silent regression that turns a broadcast join into a shuffle join, or
breaks predicate pushdown, changes no values at sf0.01 but is a cliff at
scale. These tests read the executed plan and pin the properties each
query's docstring claims.
"""

from __future__ import annotations

from databricks_feature_store_poc_spark.plans.inspect import (
    count_broadcast_joins,
    count_exchanges,
    has_partial_aggregate,
    pushed_filters,
    scan_read_schema,
)
from databricks_feature_store_poc_spark.registry import QUERIES, load_all_queries
from tests.conftest import SF_SMOKE

load_all_queries()


def test_flagship_is_broadcast_only_no_fact_shuffle(spark):
    """The training-set assembly must be a map-only pipeline over the
    spine: both dim lookups broadcast, zero shuffle exchanges."""
    df = QUERIES["training_set_flagship"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) == 2
    assert count_exchanges(df) == 0


def test_scan_parquet_pushdown_and_pruning(spark):
    df = QUERIES["scan_parquet"](spark, SF_SMOKE)
    pushed = pushed_filters(df)
    assert "l_shipdate" in pushed, f"filter not pushed: {pushed}"
    schema = scan_read_schema(df)
    # narrow projection must reach the scan: untouched wide columns absent
    assert "l_comment" not in schema and "l_returnflag" not in schema


def test_filter_in_pushdown(spark):
    pushed = pushed_filters(QUERIES["filter_in"](spark, SF_SMOKE))
    assert "In(o_orderpriority" in pushed


def test_filter_like_prefix_pushdown(spark):
    pushed = pushed_filters(QUERIES["filter_like"](spark, SF_SMOKE))
    assert "StringStartsWith(p_brand" in pushed


def test_agg_hash_has_map_side_partial(spark):
    assert has_partial_aggregate(QUERIES["agg_hash"](spark, SF_SMOKE))


def test_join_broadcast_uses_broadcast(spark):
    df = QUERIES["join_broadcast"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) == 2
    assert count_exchanges(df) == 0


def test_multiway_star_single_fact_shuffle(spark):
    """All dimension hops must broadcast; the fact stream shuffles at
    most for the lineitem ⋈ orders join plus the final aggregate. (At
    sf0.001 the optimizer broadcasts orders as well — 4 broadcasts, 1
    exchange — which only strengthens the property.)"""
    df = QUERIES["join_multiway_star"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) >= 3
    assert count_exchanges(df) <= 3


def test_limit_topk_no_global_sort(spark):
    from databricks_feature_store_poc_spark.plans.inspect import simple_plan

    plan = simple_plan(QUERIES["limit_topk"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_rolling_sum_single_shuffle(spark):
    """Both range frames share the (user_id, ts) partitioning: the plan
    must pay exactly one shuffle, not one per window."""
    df = QUERIES["feature_rolling_sum"](spark, SF_SMOKE)
    assert count_exchanges(df) == 1


def test_flagship_scan_prunes_columns(spark):
    """The orders scan must read only the 4 spine columns (ReadSchema),
    not the whole table."""
    df = QUERIES["training_set_flagship"](spark, SF_SMOKE)
    schema = scan_read_schema(df)
    assert "o_orderpriority" not in schema


def test_tpch_q1_pushdown_and_partial_agg(spark):
    df = QUERIES["tpch_q1"](spark, SF_SMOKE)
    assert "l_shipdate" in pushed_filters(df)
    assert has_partial_aggregate(df)


def test_tpch_q3_topk_not_global_sort(spark):
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    plan = physical_plan(QUERIES["tpch_q3"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan  # limit+order fused, no full sort
    assert "CartesianProduct" not in plan


def test_tpch_q5_star_has_no_cartesian_and_broadcasts_dims(spark):
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["tpch_q5"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # every dimension side (region/nation/customer/supplier) broadcasts
    assert count_broadcast_joins(df) >= 3


def test_tpch_q6_all_predicates_pushed(spark):
    pushed = pushed_filters(QUERIES["tpch_q6"](spark, SF_SMOKE))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_tpch_q18_customer_not_broadcast_hinted(spark):
    """Only the qualifying-orderkey aggregate may carry an explicit
    broadcast hint — customer is fact-scale (15M rows at sf100) and a
    forced broadcast there OOMs executors; the choice belongs to
    AQE/statistics. Hint count pins that exactly one hint exists."""
    from databricks_feature_store_poc_spark.plans.inspect import (
        count_broadcast_hints,
    )

    df = QUERIES["tpch_q18"](spark, SF_SMOKE)
    assert count_broadcast_hints(df) == 1


def test_corr_covar_partial_agg_and_single_shuffle(spark):
    """The moment sums must combine map-side (partial_sum over decimals)
    and pay one shuffle on the group key — the property that makes the
    formulation scale where a two-pass mean-then-deviation corr cannot."""
    df = QUERIES["agg_corr_covar"](spark, SF_SMOKE)
    assert has_partial_aggregate(df)
    assert count_exchanges(df) == 1


def test_weighted_bernoulli_broadcasts_the_max(spark):
    """The global-max aggregate must come back as a broadcast (1-row
    side), never a shuffle of the fact stream against it."""
    df = QUERIES["sample_weighted_bernoulli"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) >= 1


def test_resample_never_explodes_raw_events(spark):
    """The hourly grid must be built from the (user, hour) aggregate —
    raw events are grain-collapsed behind MAP-SIDE partial aggregation
    before any exchange, and the plan scans events at most twice (the
    fill rollup and the bounds/median rollup, which Catalyst prunes to
    a lighter column set). The r11 span clamp costs two extra SMALL
    exchanges (per-user bounds, per-hour join keys) over the unclamped
    r10 plan's 3 — those carry kilobytes at any scale, while the clamp
    is what bounds the OUTPUT (the r10 adversarial gate hung here);
    exchange count stays pinned so a regression back to per-event
    shuffling (no partial agg, or a raw-events join) still fails."""
    df = QUERIES["feature_resample_1h"](spark, SF_SMOKE)
    assert has_partial_aggregate(df)
    assert count_exchanges(df) <= 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") <= 2


def test_zscore_broadcasts_stats_single_fact_pass(spark):
    """The per-type moment stats must come back as a broadcast; the only
    shuffle is the moments aggregate itself — the event stream is scanned
    for scoring without repartitioning."""
    df = QUERIES["dq_outlier_zscore"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) >= 1
    assert count_exchanges(df) == 1
    assert has_partial_aggregate(df)


def test_tpch_q2_single_exchange_window_reuses_agg_partitioning(spark):
    """The explicit repartition(l_partkey) must serve BOTH the
    (partkey, suppkey) aggregate and the per-part window min — one
    exchange total, every dimension broadcast."""
    df = QUERIES["tpch_q2"](spark, SF_SMOKE)
    assert count_exchanges(df) == 1
    assert count_broadcast_joins(df) >= 3


def test_tpch_q9_dims_broadcast_one_fact_shuffle(spark):
    """Red-part subset, supplier and nation all broadcast into lineitem;
    the only shuffle joins lineitem to orders (plus the final 150-group
    agg, which AQE may fold)."""
    df = QUERIES["tpch_q9"](spark, SF_SMOKE)
    assert count_broadcast_joins(df) >= 2
    assert count_exchanges(df) <= 2
    assert has_partial_aggregate(df)


def test_tpch_q13_outer_join_double_agg_partial(spark):
    """Both aggregations must partial-aggregate map-side; the plan pays
    at most the custkey join/agg exchange plus the c_count regroup."""
    df = QUERIES["tpch_q13"](spark, SF_SMOKE)
    assert has_partial_aggregate(df)
    assert count_exchanges(df) <= 3


def test_tpch_q21_no_cartesian_and_bounded_exchanges(spark):
    """The decorrelated exists/not-exists must stay a join-agg pipeline:
    no cartesian product, supplier broadcast, exchanges bounded by the
    orderkey join + two aggregates + final name agg."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["tpch_q21"](spark, SF_SMOKE)
    assert "CartesianProduct" not in physical_plan(df)
    assert count_broadcast_joins(df) >= 1
    assert count_exchanges(df) <= 4


def test_bucketed_join_zero_exchanges(spark):
    """Bucketed tables must serve the merge join AND the per-key
    aggregate with no Exchange anywhere — the pay-the-shuffle-once
    co-location contract."""
    df = QUERIES["join_bucketed_colocated"](spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    assert "SortMergeJoin" in physical_plan(df)


def test_partitioned_sink_scan_is_partition_pruned(spark):
    """The status filter must resolve against the directory layout
    (PartitionFilters), not per-file data filters."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["sink_partitioned_pruned"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "PartitionFilters" in plan and "o_orderstatus" in
        plan.split("PartitionFilters", 1)[1][:200]
    ), plan[:2000]


def test_interval_overlap_is_equi_join_not_nested_loop(spark):
    """The bucketized range join must plan as an equi-join on the time
    bucket — never BroadcastNestedLoop/Cartesian over the raw theta
    predicate."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["join_interval_overlap"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_fires(spark):
    """The data-dependent dim filter can't fold into a static partition
    filter, so the fact scan must carry a dynamicpruning expression."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["join_dynamic_partition_pruning"](spark, SF_SMOKE)
    assert "dynamicpruning" in physical_plan(df).lower()


import pytest as _pytest

_TPCH_ALL = [f"tpch_q{i}" for i in range(1, 23)]


@_pytest.mark.parametrize("name", _TPCH_ALL)
def test_tpch_plan_discipline(name, spark):
    """Every TPC-H query must partial-aggregate map-side, never fall
    into a cartesian product, and keep its exchange count bounded —
    the properties that decide whether the plan survives a 100x
    scale-up. (Q2's tighter single-exchange pin and the q9/q13/q18/q21
    specifics are asserted separately.)"""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES[name](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, name
    assert has_partial_aggregate(df), name
    assert count_exchanges(df) <= 5, (name, count_exchanges(df))


def test_no_query_plans_a_cartesian_product(spark):
    """Fleet-wide net: NO registered query may plan a CartesianProduct —
    the silent scale-killer a refactor can introduce without changing a
    single output value at test SF. (1-row broadcast anchors plan as
    BroadcastNestedLoopJoin, which is bounded and allowed.) Builds every
    plan once at the smoke SF; failures name the query."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    offenders = []
    for name in sorted(QUERIES):
        plan = physical_plan(QUERIES[name](spark, SF_SMOKE))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_no_query_emits_decimal_output(spark):
    """Fleet-wide schema lint (VERDICT r15 order #2): NO registered query
    may emit DECIMAL in its driver-visible schema. The driver's value
    normalizer fetches DECIMAL through a pandas/Arrow path that diverges
    between engines (Decimal('-130') vs -130.0) even when values are
    bit-identical — text_zipf_fit was CORRECTNESS_r15's only red for
    exactly this. DECIMAL arithmetic INSIDE a plan is fine (and needed,
    e.g. for the zipf cross products); the lint is on output columns
    only. Checks nested array/map/struct element types too."""
    from pyspark.sql.types import (
        ArrayType,
        DataType,
        DecimalType,
        MapType,
        StructType,
    )

    def has_decimal(dt: DataType) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_decimal(dt.elementType)
        if isinstance(dt, MapType):
            return has_decimal(dt.keyType) or has_decimal(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_decimal(f.dataType) for f in dt.fields)
        return False

    offenders = []
    build_errors = []
    for name in sorted(QUERIES):
        # ADVICE r16 #3: some builders (text_bpe_learn/apply) run real
        # jobs at BUILD time; a runtime failure there is an operator
        # bug covered by its own oracle tests, not a DECIMAL-lint
        # finding — record it separately so the lint only reports
        # schema offenses.
        try:
            schema = QUERIES[name](spark, SF_SMOKE).schema
        except Exception as exc:  # noqa: BLE001 — lint isolation
            build_errors.append((name, repr(exc)[:200]))
            continue
        bad = [f.name for f in schema.fields if has_decimal(f.dataType)]
        if bad:
            offenders.append((name, bad))
    assert not offenders, offenders
    assert not build_errors, (
        "builders failed during schema lint (not DECIMAL offenses; "
        "see their own tests)", build_errors,
    )


def test_gdpr_delete_no_fact_shuffle_all_broadcast(spark):
    """Deletion propagation must never shuffle a fact table: every
    membership test is a BroadcastHashJoin (4 audit branches + the
    transitive deleted-orders LeftSemi) and the only exchanges are the
    1-row SinglePartition finals, which count_exchanges excludes."""
    df = QUERIES["pipeline_gdpr_delete"](spark, SF_SMOKE)
    assert count_exchanges(df) == 0
    assert count_broadcast_joins(df) == 5
    assert has_partial_aggregate(df)


def test_quantile_bin_histogram_pass_and_constant_reentry(spark):
    """The discretizer pays exactly two hash shuffles (value histogram +
    the 10-bin final aggregate); the cut frame re-enters as a 1-row
    broadcast (BroadcastNestedLoopJoin of one row = map-side constant),
    and the raw data is never sort-merge joined or globally sorted."""
    from databricks_feature_store_poc_spark.plans.inspect import simple_plan

    df = QUERIES["feature_quantile_bin"](spark, SF_SMOKE)
    assert count_exchanges(df) == 2
    sp = simple_plan(df)
    assert "BroadcastNestedLoop" in sp
    assert "SortMergeJoin" not in sp


def test_cumulative_distinct_three_bounded_shuffles(spark):
    """Running COUNT(DISTINCT): one shuffle for the first-flag window on
    (event_type, user_id), one partial+final aggregate to day grain, and
    the cumulative frame's exchange over the aggregated table — never a
    per-row distinct state or a global sort of the raw events."""
    df = QUERIES["win_cumulative_distinct"](spark, SF_SMOKE)
    assert count_exchanges(df) == 3
    assert has_partial_aggregate(df)


def test_interval_overlap_count_single_scan_per_fact(spark):
    """r9 rank decomposition: the per-priority overlap COUNT must plan
    exactly one parquet scan of each fact (a second reference to the
    shipment histogram re-derives the lineitem scan — the
    k-references-k-derivations trap), one broadcast probe join, and no
    nested loop; work is linear in the inputs at any scale."""
    from databricks_feature_store_poc_spark.plans.inspect import simple_plan

    df = QUERIES["join_interval_overlap"](spark, SF_SMOKE)
    sp = simple_plan(df)
    assert sp.count("Scan parquet") == 2, sp
    assert "BroadcastNestedLoop" not in sp and "CartesianProduct" not in sp
    assert count_broadcast_joins(df) >= 1


def test_plan_scan_audit_no_unexplained_multiscans():
    """Standing duplicate-scan gate (r9 carryover, promoted r11): every
    registered query's physical plan is audited for tables scanned >= 3
    times; the classified multi-scan queries (KNOWN_MULTI_SCAN in
    scripts/audit_plan_scans.py, each a constant-by-design protocol
    shape) must be the ONLY flagged ones, and every query must plan.
    ~80 s for the full registry — the price of catching the
    k-references-= k-scans regression class before it ships."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "scripts/audit_plan_scans.py"],
        cwd="/root/repo", text=True, timeout=580,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    assert p.returncode == 0, p.stdout[-3000:]


def test_pagerank_edge_cache_has_no_build_side_repartition(spark):
    """r18 (VERDICT r17 #2 resolution): the r17 `.repartition("src")`
    before the edge-cache persist was REVERTED — under the session
    default canChangeCachedPlanOutputPartitioning=true AQE re-partitions
    the cached plan anyway, so the repartition only added Exchanges at
    cache build (pagerank plan 70 -> 62, plans/r18). Pin the reverted
    shape: no REPARTITION_BY_COL Exchange anywhere in the pagerank plan
    (re-adding the one-liner is the documented cluster deployment knob,
    not the local default)."""
    from databricks_feature_store_poc_spark.plans.inspect import physical_plan

    df = QUERIES["graph_pagerank"](spark, SF_SMOKE)
    assert "REPARTITION_BY_COL" not in physical_plan(df)
