"""Embedding-side training-data pipeline: the round-6 operators end to end.

The text-side funnel lives in examples/curate_corpus.py; this script runs
the vector-side lifecycle a pretraining/retrieval stack needs, plus the
serving sync:

    chunking -> (corpus stats)                # context-window prep
    quantize int8 -> gram matrix (PCA pass)   # storage + projection prep
    k-means -> SemDeDup within-cluster pairs  # semantic dedup
    range search + hard negatives             # retrieval / contrastive prep
    feature table -> KV delta sync            # online serving path

    python examples/embedding_pipeline.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from databricks_feature_store_poc_spark.session import get_spark  # noqa: E402
from databricks_feature_store_poc_spark.sources.catalog import load_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("embedding-pipeline", master="local[8]", shuffle_partitions=8)
    load_all_queries()
    q = QUERIES

    # 1. context-window chunking of the text corpus
    chunks = q["text_chunk_sliding"](spark, sf_dir)
    print(f"chunks: {chunks.count()} over {chunks.select('doc_id').distinct().count()} docs")

    # 2. int8 quantization audit + the X^T X PCA pass
    quant = q["embed_quantize_int8"](spark, sf_dir)
    worst = quant.agg(F.max("sum_abs_err_q")).first()[0]
    print(f"quantized vectors: {quant.count()} (worst |err| {worst / 1e9:.6f})")
    gram = q["embed_gram_matrix"](spark, sf_dir)
    print(f"gram matrix cells: {gram.count()} (driver-side eigen comes next in a real PCA)")

    # 3. semantic dedup: cluster sizes + within-cluster near-dup pairs
    sem = q["dedup_semantic_cluster"](spark, sf_dir).orderBy("cid")
    for r in sem.collect():
        print(f"  cluster {r['cid']}: {r['n_vectors']} vecs, "
              f"{r['n_dup_pairs']} near-dup pairs, {r['n_dup_vectors']} droppable")

    # 4. retrieval prep: threshold search + contrastive hard negatives
    print(f"range-search hits: {q['sim_range_search'](spark, sf_dir).count()}")
    print(f"hard negatives:    {q['sample_hard_negatives'](spark, sf_dir).count()}")

    # 5. serving: sync a small feature view to a KV backend, then delta
    from databricks_feature_store_poc_spark.featurestore.online import (
        OnlineStoreSync,
        SpoolDirKV,
    )

    feats = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr("size(embedding)").alias("dims")
    )
    kv = SpoolDirKV(os.path.join(tempfile.mkdtemp(), "kv"))
    sync = OnlineStoreSync(kv, ["vec_id"])
    sync.full_sync(feats)
    sync.delta_sync(feats, feats.withColumn(
        "label", F.when(F.col("vec_id") < 5, F.col("label") + 1).otherwise(F.col("label"))
    ))
    stats = kv.stats()
    print(f"KV sync: {stats['n_writes']} writes total "
          f"({stats['n_writes'] - len(kv.load())} delta), lookup(0) -> {kv.get((0,))}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
