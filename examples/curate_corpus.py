"""Curate a pretraining corpus end to end: the LLM-pipeline lifecycle.

The registered queries are the building blocks; this script runs the
whole curation funnel on the documents/embeddings tables and prints the
survivor counts at each stage — the shape of a production data-mix job:

    quality filter -> exact dedup -> span dedup -> near-dup (MinHash-LSH)
    -> decontamination -> repetition filter -> stratified sample
    -> sequence packing -> (similarity probe over embeddings)

    python examples/curate_corpus.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("curate-corpus", master="local[8]", shuffle_partitions=8)
    load_all_queries()
    q = QUERIES

    n_raw = load_table(spark, sf_dir, "documents").count()
    print(f"raw corpus:            {n_raw} docs")

    stages = [
        ("quality-scored", "text_quality_score"),
        ("exact dedup survivors", "dedup_exact"),
        ("span-dedup survivors", "text_span_dedup"),
        ("near-dup pairs (LSH)", "dedup_near_minhash"),
        ("decontaminated", "text_decontaminate"),
        ("repetition-flagged", "text_repetition_score"),
        ("stratified sample", "sample_stratified_hash"),
        ("packed sequences", "pack_sequences"),
        ("5-stage pipeline out", "pipeline_curate_corpus"),
    ]
    for label, name in stages:
        df = q[name](spark, sf_dir)
        print(f"{label:22s} {df.count()} rows")

    # similarity probe: exact top-k next to its two ANN routes
    for name in ("sim_cosine_topk", "sim_ann_lsh", "sim_ivf_topk"):
        df = q[name](spark, sf_dir)
        print(f"{name:22s} {df.count()} rows")

    print("corpus curation lifecycle complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
