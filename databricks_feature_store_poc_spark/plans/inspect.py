"""Physical-plan inspection helpers.

Correctness says *what* a query returns; these helpers pin *how* — the
plan properties that decide whether an operator survives a 100x scale-up:
did the dim join broadcast, did the filter reach the parquet scan, did the
aggregate get a map-side partial, how many exchanges (shuffles) does the
plan pay. tests/test_plans.py asserts these on the flagship queries so a
regression that silently de-broadcasts a join or breaks pushdown fails CI
even though every value is still correct.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what .explain prints).
    Captured from df.explain — the py4j explainString signature is not
    stable across Spark versions."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges the plan pays (broadcast exchanges are
    counted separately — they move dims, not the fact stream)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          simple_plan(df)))


def count_broadcast_joins(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin") + simple_plan(df).count(
        "BroadcastNestedLoopJoin"
    )


def count_broadcast_hints(df: DataFrame) -> int:
    """Explicit ``F.broadcast()`` hints in the analyzed logical plan —
    distinct from broadcasts the optimizer *chose* from statistics. A
    forced hint on a fact-scale table is a scale bug even when stats would
    also broadcast it at test SF, so plan tests pin the hint count. Only
    broadcast-strategy hints count — MERGE/SHUFFLE_HASH hints print as
    ResolvedHint too and must not inflate the number."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint[^\n]*broadcast", plan, re.IGNORECASE))


def has_sort_merge_or_shuffled_hash_join(df: DataFrame) -> bool:
    p = simple_plan(df)
    return "SortMergeJoin" in p or "ShuffledHashJoin" in p


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause(s) of the scan nodes, concatenated."""
    return " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", physical_plan(df)))


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema clause(s) — what the scan actually reads; a scan
    reading all columns for a narrow projection means pruning broke."""
    return " ".join(re.findall(r"ReadSchema: [^\n]*", physical_plan(df)))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the aggregate runs partial (map-side combine) + final."""
    p = simple_plan(df)
    return "partial_" in p


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many whole-stage-codegen regions the plan compiles into."""
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))
