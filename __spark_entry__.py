"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``databricks_feature_store_poc_spark.registry`` — every
operator from SURVEY.md §2 registers itself there with its DuckDB oracle
adjacent to the Spark implementation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import (  # noqa: E402
    ensure_session_confs,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's training-set assembly (J1: spine LEFT JOIN broadcast
    feature tables; SURVEY.md §3 E2) transposed onto the testdata star
    schema.
    """
    ensure_session_confs(spark)
    load_all_queries()
    return QUERIES["training_set_flagship"](spark, "/root/testdata/sf0.001")


# The driver adjudicates ~50 queries per round in dict order, so the dict
# is emitted in ADJUDICATION-PRIORITY order, not alphabetical. Round-16
# policy (VERDICT r15 'do this' #1-#3 — zipf first, then retire the
# remaining ledger debt; tier arithmetic COUNTED before writing this
# comment): 1 headline + 13 changed + 2 r9-age stragglers + 19 r10-age
# + 15 r11-age head = 50 slots exactly; the next r11 keys ride at
# positions 51+ in case the driver's budget stretches. Done-criterion
# (VERDICT r15 #3): after CORRECTNESS_r16 the merged ledger has NO
# verdict older than r11.
#   0. the headline training-set assembly (1 key, always adjudicated);
#   1. changed-in-r16, 13 keys: text_zipf_fit (slot 2 as ordered —
#      slope columns now DOUBLE; DECIMAL(38,0) arithmetic stays
#      internal), mm_decode_jpeg (NEW: sixth codec, baseline JFIF
#      huffman+DCT), mm_decode_jpeg_color (NEW: seventh codec — 4:2:0
#      interleaved color MCUs, fixed-point YCbCr->RGB),
#      dedup_simhash_clusters and dedup_minhash_clusters (NEW: O(docs)
#      structural dedup, star edges + connected components),
#      pack_sequences (promoted to FULL oracle: md5 shard +
#      recursive-CTE FFD replay), text_tfidf_topterms (promoted to
#      FULL oracle: exact integer triple emitted),
#      agg_exact_quantile_grouped (null-safe pass-2 probe join),
#      text_url_canonicalize (pmod oracle + empty-source host guard),
#      mm_decode_png and mm_decode_gif (truncation bounds checks —
#      engine output unchanged, changed-keys rule re-adjudicates),
#      text_bpe_learn and text_bpe_apply (NEW: distributed BPE
#      tokenizer training + application, unrolled-CTE oracles);
#   2. the 2 r9-age stragglers (win_rank, win_topk_per_group — budget-
#      cut at positions 51-52 last round);
#   3. the COMPLETE r10-age cohort (18 keys) + text_tfidf_audit (the
#      promoted key's twin, re-adjudicated alongside per VERDICT r15
#      #3's pairing note) = 19 slots;
#   4. the r11-age head (15 of 34 remaining, alphabetical; the rest
#      ride at positions 51-70 and are the r17 tier-2 head otherwise).

_HEADLINE = (
    "training_set_flagship",
)
_CHANGED_TIER = (
    "text_zipf_fit",
    "mm_decode_jpeg",
    "mm_decode_jpeg_color",
    "dedup_simhash_clusters",
    "dedup_minhash_clusters",
    "pack_sequences",
    "text_tfidf_topterms",
    "agg_exact_quantile_grouped",
    "text_url_canonicalize",
    "mm_decode_png",
    "mm_decode_gif",
    "text_bpe_learn",
    "text_bpe_apply",
)
# r9-age stragglers (merged-ledger verdicts last adjudicated r9)
_R9_COHORT = (
    "win_rank",
    "win_topk_per_group",
)
# r10-age cohort, complete
_R10_COHORT = (
    "agg_bloom_filter",
    "agg_hll_sketch",
    "agg_latency_bands",
    "agg_mode_deterministic",
    "dedup_embedding_stats",
    "embed_quantize_int8",
    "join_asof",
    "merge_scd1_upsert",
    "sink_partitioned_pruned",
    "sink_sorted_parquet",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q4",
    "win_ntile_deciles",
    "text_tfidf_audit",
)
# r11-age head (alphabetical; pack_sequences/text_tfidf_topterms moved
# to the changed tier, mm_decode_stub rides with the codec family)
_R11_HEAD = (
    "agg_countmin_sketch",
    "agg_heavy_hitters",
    "dedup_embedding_cosine",
    "densify_daily_spine",
    "embed_gram_norms",
    "eval_auc_roc",
    "feature_importance",
    "fn_json",
    "fn_map",
    "fn_string",
    "fn_url",
    "graph_jaccard_neighbors",
    "merge_scd2_history",
    "mm_decode_stub",
    "mm_frame_sample",
)
# r11-age tail at positions 51-70: adjudicated only if the driver's
# budget stretches past 50; else the r17 tier-2 head
_R11_TAIL = (
    "pipeline_clean_corpus",
    "pipeline_incremental_curate",
    "scan_csv_infer",
    "scan_csv_malformed_quarantine",
    "scan_text_lines",
    "sim_cosine_topk",
    "sim_range_search",
    "sink_vacuum_retention",
    "sink_zorder",
    "stream_stateful_parity",
    "text_chunk_sliding",
    "text_fingerprint",
    "text_quality_score",
    "text_stats",
    "tpch_q16",
    "training_set_on_demand",
    "training_set_pit_on_demand",
    "training_set_point_in_time",
    "udtf_explode_tokens",
    "udtf_native_split",
)


def _priority_order(names: list[str]) -> list[str]:
    def tier(name: str) -> tuple:
        if name in _HEADLINE:
            return (0, _HEADLINE.index(name), "")
        if name in _CHANGED_TIER:
            return (1, _CHANGED_TIER.index(name), "")
        if name in _R9_COHORT:
            return (2, _R9_COHORT.index(name), "")
        if name in _R10_COHORT:
            return (3, _R10_COHORT.index(name), "")
        if name in _R11_HEAD:
            return (4, _R11_HEAD.index(name), "")
        if name in _R11_TAIL:
            return (5, _R11_TAIL.index(name), "")
        return (6, 0, name)

    return sorted(names, key=tier)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "query_name", fn.__name__)
        return run

    return {name: _wrap(QUERIES[name]) for name in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    load_all_queries()
    return dict(ORACLES)
