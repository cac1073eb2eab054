"""Vector-column operators for embedding pipelines: int8 quantization
and exact fixed-point k-means clustering.

Both are staples of a 100 TB embedding pipeline:
- **int8 quantization** cuts vector storage/bandwidth 4x before ANN
  indexing (the standard serving-side compression); it is a pure
  map-only transform — higher-order array functions, no shuffle, no
  Python.
- **k-means** is the clustering primitive behind IVF coarse quantizers
  (llm/similarity.py fits its centroids on a driver sample; this is the
  full distributed Lloyd's iteration) and behind semantic dedup /
  topic-bucketing of corpora.

Correctness strategy (same trick as operators/graph.py): all checked
arithmetic is **fixed-point BIGINT**. Embeddings are quantized to
integer grid units once, then every distance, sum, and centroid mean is
exact integer math — bit-identical across Spark, DuckDB, and any
partition order. Doubles appear only where a single IEEE op per value
is involved (scale factors), never accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.cacheutil import (
    tracked_local_checkpoint as _ckpt,
)
from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

DIMS = 64

# --- int8 quantization -----------------------------------------------------
# Symmetric per-vector quantization: scale = amax/127; q = round(x/scale).
# round() is floor(v + 0.5) on both engines — an explicit, tie-stable rule
# (SQL round() half-away vs half-even varies by engine/type).
_Q_EXPR = (
    "transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) * 127.0) / amax"
    " + 0.5) AS BIGINT))"
)
# Per-element |x - dequant(q)| scaled to 1e-9 units and floor-rounded to
# BIGINT before summing — the sum is then exact and order-free.
_ERR_EXPR = (
    "aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> acc + CAST(floor("
    "abs(CAST(x AS DOUBLE) - (CAST(CAST(floor((CAST(x AS DOUBLE) * 127.0) / amax"
    " + 0.5) AS BIGINT) AS DOUBLE) * amax) / 127.0) * 1000000000.0 + 0.5)"
    " AS BIGINT))"
)


@query(
    "embed_quantize_int8",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               embedding,
               list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) AS amax
        FROM embeddings
    )
    SELECT vec_id,
           amax,
           CAST(list_max([CAST(floor((CAST(x AS DOUBLE) * 127.0) / amax + 0.5)
                          AS BIGINT) FOR x IN embedding]) AS BIGINT) AS max_q,
           CAST(list_min([CAST(floor((CAST(x AS DOUBLE) * 127.0) / amax + 0.5)
                          AS BIGINT) FOR x IN embedding]) AS BIGINT) AS min_q,
           CAST(list_aggregate([CAST(floor(abs(CAST(x AS DOUBLE)
                 - (CAST(CAST(floor((CAST(x AS DOUBLE) * 127.0) / amax + 0.5)
                         AS BIGINT) AS DOUBLE) * amax) / 127.0)
                 * 1000000000.0 + 0.5) AS BIGINT) FOR x IN embedding], 'sum')
                AS BIGINT) AS sum_abs_err_q
    FROM q
    WHERE amax > 0
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column with an exact
    per-vector reconstruction-error audit.

    Checked values: the per-vector scale bound (amax — a single float
    element cast to double, bit-exact), the quantized extrema (must lie
    in [-127, 127]), and the total |reconstruction error| in 1e-9 units
    (BIGINT — exact). The oracle recomputes the identical per-element
    IEEE ops, so the driver verifies the quantizer's arithmetic, not
    just its shape. Map-only; at 100 TB this runs at scan speed with
    zero shuffles.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.withColumn(
        "amax",
        F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"),
    ).filter(F.col("amax") > 0)
    return q.select(
        "vec_id",
        "amax",
        F.expr(f"array_max({_Q_EXPR})").alias("max_q"),
        F.expr(f"array_min({_Q_EXPR})").alias("min_q"),
        F.expr(_ERR_EXPR).alias("sum_abs_err_q"),
    )


# --- fixed-point k-means ---------------------------------------------------
# Grid: q = floor(x * 2^20 + 0.5) + 2^21. The +2^21 offset keeps every
# value non-negative, so integer division is floor division on every
# engine (negative "div" truncates toward zero in Spark/Python but not
# everywhere); distances are offset-invariant.
K = 8
KM_ITERS = 2  # assignment rounds: assign -> update -> assign -> report
_GRID = 1_048_576  # 2^20
_OFFSET = 2_097_152  # 2^21
_QV = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_GRID} + 0.5)"
    f" AS BIGINT) + {_OFFSET})"
)
_DUCK_QV = (
    f"[CAST(floor(CAST(x AS DOUBLE) * {_GRID} + 0.5) AS BIGINT) + {_OFFSET}"
    " FOR x IN embedding]"
)


def _dist_expr(qv_col: str, centroid: list[int]) -> str:
    """Exact squared L2 between a quantized vector column and a literal
    centroid: aggregate(zip_with(...)) — one fused JVM expression."""
    arr = "array(" + ",".join(f"CAST({c} AS BIGINT)" for c in centroid) + ")"
    return (
        f"aggregate(zip_with({qv_col}, {arr}, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def kmeans_assign(vectors: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """Map-only assignment: distances to all centroids as one array
    expression, best = first minimum (ties break to the lowest cid, the
    same rule as the oracle's ORDER BY dist, cid)."""
    cids = sorted(centroids)
    dists = "array(" + ",".join(_dist_expr("qv", centroids[c]) for c in cids) + ")"
    cid_arr = "array(" + ",".join(str(c) for c in cids) + ")"
    return vectors.select(
        "vec_id",
        "qv",
        F.expr(f"element_at({cid_arr}, CAST(array_position({dists},"
               f" array_min({dists})) AS INT))").alias("cid"),
        F.expr(f"array_min({dists})").alias("dist"),
    )


def kmeans_update(assigned: DataFrame) -> dict[int, list[int]]:
    """One centroid update: per-cluster integer mean (sum // count) of
    each dimension. The per-cluster aggregate is K x DIMS cells — tiny —
    so collecting it to the driver is the standard Lloyd's orchestration
    (Spark MLlib does the same); all heavy work stays distributed."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(DIMS)
    ]
    rows = assigned.groupBy("cid").agg(*aggs).collect()
    return {
        int(r["cid"]): [int(r[f"s{i}"]) // int(r["n"]) for i in range(DIMS)]
        for r in rows
    }


_KMEANS_CTES = f"""
    v AS (SELECT vec_id, qv FROM (
              SELECT vec_id, {_DUCK_QV} AS qv,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY {_DUCK_QV}) AS dup_rn
              FROM embeddings WHERE embedding IS NOT NULL)
          WHERE dup_rn = 1),
    ve AS (SELECT vec_id, i, qv[i] AS q FROM v, range(1, {DIMS + 1}) r(i)),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, vec_id
        FROM (SELECT vec_id FROM v ORDER BY vec_id LIMIT {K})
    ),
    ce0 AS (SELECT c0.cid, ve.i, ve.q AS c FROM c0 JOIN ve USING (vec_id)),
    d1 AS (
        SELECT ve.vec_id, ce0.cid,
               CAST(SUM((ve.q - ce0.c) * (ve.q - ce0.c)) AS BIGINT) AS dist
        FROM ve JOIN ce0 ON ve.i = ce0.i GROUP BY ve.vec_id, ce0.cid
    ),
    a1 AS (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d1
    ),
    ce1 AS (
        SELECT a.cid, ve.i, CAST(SUM(ve.q) // COUNT(*) AS BIGINT) AS c
        FROM (SELECT vec_id, cid FROM a1 WHERE rn = 1) a
        JOIN ve USING (vec_id) GROUP BY a.cid, ve.i
    ),
    d2 AS (
        SELECT ve.vec_id, ce1.cid,
               CAST(SUM((ve.q - ce1.c) * (ve.q - ce1.c)) AS BIGINT) AS dist
        FROM ve JOIN ce1 ON ve.i = ce1.i GROUP BY ve.vec_id, ce1.cid
    ),
    a2 AS (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d2
    )"""


@query(
    "cluster_kmeans",
    oracle=f"""
    WITH {_KMEANS_CTES}
    SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
           CAST(SUM(dist) AS BIGINT) AS inertia_q
    FROM a2 WHERE rn = 1 GROUP BY cid
    """,
)
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding table, exact enough
    for the driver to hash-verify: embeddings on a 2^20 fixed-point grid,
    init = the K lowest vec_ids, two assignment rounds with one integer-
    mean centroid update between them; output per-cluster sizes and
    exact integer inertia. The DuckDB oracle unrolls the identical
    recurrence relationally, so assignment ties, the centroid division,
    and the inertia sum are all value-checked.

    Scale: assignments are map-only against broadcast centroid literals
    (K x DIMS ints); the only shuffle per iteration is a K-row aggregate.
    BIGINT inertia holds to ~1e6 vectors per cluster at this grid; past
    that, report per-cluster mean inertia instead.
    """
    assigned = kmeans_fit_assign(spark, sf_dir)
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist").alias("inertia_q"),
    )


def kmeans_fit_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fit+assign pipeline shared by cluster_kmeans and
    dedup_semantic_cluster: init = K lowest vec_ids, KM_ITERS assignment
    rounds with integer-mean updates between them. Returns
    (vec_id, qv, cid, dist), session-persisted per corpus: the memo is
    checked BEFORE the fit runs, so the second caller (cluster_kmeans
    vs dedup_semantic_cluster) pays neither the init collect nor the
    per-iteration centroid-update collects — only the first call runs
    the collect-driven fit (ADVICE r6)."""
    import os as _os

    from databricks_feature_store_poc_spark.cacheutil import (
        session_get,
        session_persist,
    )

    sources = [_os.path.join(sf_dir, "embeddings.parquet")]
    cached = session_get(spark, "kmeans_assignment", sources)
    if cached is not None:
        return cached

    # NULL embeddings are not clusterable points: excluded here and in
    # the oracle's v CTE (the adversarial replica carries NULL vectors).
    # vec_id is the POINT IDENTITY: conflicting duplicate ids (r12 dup
    # replica — same vec_id, different payload) resolve to the
    # lexicographically-least quantized code on both engines, so "the
    # point with id X" stays well-defined for init, assignment, and the
    # n_dup_vectors accounting downstream.
    from pyspark.sql.window import Window as _W

    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.expr(_QV).alias("qv"))
        .withColumn(
            "__dup_rn",
            F.row_number().over(_W.partitionBy("vec_id").orderBy("qv")),
        )
        .filter(F.col("__dup_rn") == 1)
        .drop("__dup_rn")
    )
    init_rows = base.orderBy("vec_id").limit(K).collect()
    if not init_rows:
        # degenerate corpus (r11): no clusterable points — an empty
        # assignment with the full schema; kmeans_assign's centroid
        # literal array would otherwise be untyped (analysis error)
        empty = base.withColumn("cid", F.lit(0).cast("int")).withColumn(
            "dist", F.lit(0).cast("bigint")
        ).limit(0)
        return session_persist(spark, "kmeans_assignment", sources, empty)
    centroids = {i + 1: [int(x) for x in r["qv"]] for i, r in enumerate(init_rows)}
    assigned = kmeans_assign(base, centroids)
    for _ in range(KM_ITERS - 1):
        centroids = kmeans_update(assigned)
        assigned = kmeans_assign(base, centroids)
    return session_persist(spark, "kmeans_assignment", sources, assigned)


# --- SemDeDup: cluster-then-pair semantic dedup ----------------------------
# Cosine threshold 2/5 (0.4) applied in exact integer arithmetic on the
# UN-offset grid: cos(a,b) >= t  <=>  dot > 0 AND den^2*dot^2 >= num^2*|a|^2*|b|^2
# (cross-multiplied to avoid sqrt; squares go through DECIMAL(38,0) /
# HUGEINT, both exact).
COS_NUM = 2
COS_DEN = 5
_QV0 = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_GRID} + 0.5)"
    " AS BIGINT))"
)
_DUCK_QV0 = (
    f"[CAST(floor(CAST(x AS DOUBLE) * {_GRID} + 0.5) AS BIGINT)"
    " FOR x IN embedding]"
)


@query(
    "dedup_semantic_cluster",
    oracle=f"""
    WITH {_KMEANS_CTES},
    asgn AS (SELECT vec_id, cid FROM a2 WHERE rn = 1),
    v0 AS (SELECT vec_id, q0 FROM (
               SELECT vec_id, {_DUCK_QV0} AS q0,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY {_DUCK_QV0}) AS dup_rn
               FROM embeddings WHERE embedding IS NOT NULL)
           WHERE dup_rn = 1),
    ve0 AS (SELECT vec_id, i, q0[i] AS q FROM v0, range(1, {DIMS + 1}) r(i)),
    norms AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
              FROM ve0 GROUP BY vec_id),
    pairs AS (
        SELECT a.cid, a.vec_id AS va, b.vec_id AS vb
        FROM asgn a JOIN asgn b ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    dots AS (
        SELECT p.cid, p.va, p.vb, CAST(SUM(x.q * y.q) AS BIGINT) AS dot
        FROM pairs p
        JOIN ve0 x ON x.vec_id = p.va
        JOIN ve0 y ON y.vec_id = p.vb AND y.i = x.i
        GROUP BY p.cid, p.va, p.vb
    ),
    dup AS (
        SELECT d.cid, d.va, d.vb
        FROM dots d
        JOIN norms na ON na.vec_id = d.va
        JOIN norms nb ON nb.vec_id = d.vb
        WHERE d.dot > 0
          AND {COS_DEN * COS_DEN} * (CAST(d.dot AS HUGEINT) * d.dot)
              >= {COS_NUM * COS_NUM} * (CAST(na.n2 AS HUGEINT) * nb.n2)
    )
    SELECT g.cid,
           CAST(g.n_vectors AS BIGINT) AS n_vectors,
           CAST(COALESCE(p.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(p.n_dup_vectors, 0) AS BIGINT) AS n_dup_vectors
    FROM (SELECT cid, count(*) AS n_vectors FROM asgn GROUP BY cid) g
    LEFT JOIN (SELECT cid, count(*) AS n_dup_pairs,
                      count(DISTINCT vb) AS n_dup_vectors
               FROM dup GROUP BY cid) p USING (cid)
    """,
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic deduplication: k-means buckets the corpus
    (the fixed-point pipeline shared with cluster_kmeans), then exact
    cosine pairs are scored ONLY within each cluster — pair cost is
    sum over clusters of |c|^2, never |corpus|^2, which is the whole
    point of cluster-then-dedup at 100 TB (SemDeDup, Abbas et al. 2023:
    drop all-but-one of each within-cluster near-dup group).

    Pair scoring is an Arrow-batched applyInPandas kernel, one task per
    cluster: the within-cluster dot matrix comes from a float64 BLAS
    matmul that is EXACT (every product <= 1.1e12 and every 64-term sum
    <= 7e13 — both under 2^53, so float64 arithmetic never rounds), and
    the cross-multiplied threshold compare runs in float64 with a
    certified error margin, falling back to Python bignum only for the
    rare borderline pairs. Bit-identical to the relational formulation
    the DuckDB oracle runs — and ~50x faster than per-pair interpreted
    lambdas (10x stress: 290s -> seconds at 20k vectors).

    Scale contract: one cluster must fit a task (the SemDeDup deployment
    rule — pick k so |cluster| ~ corpus/k stays bounded; the paper uses
    k in the tens of thousands at billion-doc scale); the kernel blocks
    the matmul by rows so memory is O(block x |c|), not |c|^2.

    Checked per cluster: member count, near-dup pair count, and distinct
    dedup-victim count (the higher vec_id of each pair — keep-lowest
    policy). Within-cluster recall vs the global pair set is measured in
    tests — the documented trade of the clustered formulation.
    """
    import pandas as pd

    from pyspark.sql.window import Window as _W

    assigned = kmeans_fit_assign(spark, sf_dir).select("vec_id", "cid")
    e = load_table(spark, sf_dir, "embeddings")
    # same per-vec_id representative rule as the fit (least q0) — a raw
    # join against embeddings would fan duplicated vec_ids back out
    q0 = (
        e.filter(F.col("embedding").isNotNull())
        .select("vec_id", F.expr(_QV0).alias("q0"))
        .withColumn(
            "__dup_rn",
            F.row_number().over(_W.partitionBy("vec_id").orderBy("q0")),
        )
        .filter(F.col("__dup_rn") == 1)
        .drop("__dup_rn")
    )
    side = assigned.join(q0, "vec_id").select("cid", "vec_id", "q0")

    den2, num2 = COS_DEN * COS_DEN, COS_NUM * COS_NUM

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")
        n = len(pdf)
        cid = int(pdf["cid"].iloc[0])
        if n < 2:
            return pd.DataFrame(
                [[cid, n, 0, 0]],
                columns=["cid", "n_vectors", "n_dup_pairs", "n_dup_vectors"],
            )
        Q = np.vstack(pdf["q0"].to_numpy()).astype(np.float64)  # exact: |q| < 2^21
        n2 = (Q * Q).sum(axis=1)  # exact: <= 7e13 < 2^53
        n_pairs = 0
        victims: set[int] = set()
        vids = pdf["vec_id"].to_numpy()
        block = 1024  # bounds memory at O(block x n)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            G = Q[lo:hi] @ Q.T  # exact float64 integer values
            for bi in range(hi - lo):
                i = lo + bi
                row = G[bi, i + 1:]          # j > i only
                nb = n2[i + 1:]
                lhs = den2 * row * row        # <= 1.2e29: float64, err < 2e13
                rhs = num2 * n2[i] * nb
                pos = row > 0
                sure = pos & (lhs >= rhs + 1e14)
                border = pos & ~sure & (lhs >= rhs - 1e14)
                hits = np.flatnonzero(sure)
                for j in np.flatnonzero(border):  # exact bignum recheck
                    d = int(row[j])
                    if den2 * d * d >= num2 * int(n2[i]) * int(nb[j]):
                        hits = np.append(hits, j)
                if hits.size:
                    n_pairs += int(hits.size)
                    victims.update(int(v) for v in vids[i + 1:][hits])
        return pd.DataFrame(
            [[cid, n, n_pairs, len(victims)]],
            columns=["cid", "n_vectors", "n_dup_pairs", "n_dup_vectors"],
        )

    return side.groupBy("cid").applyInPandas(
        score_cluster,
        schema="cid int, n_vectors long, n_dup_pairs long, n_dup_vectors long",
    )


# --- gram matrix (the distributed heavy pass of PCA) -----------------------


@query(
    "embed_gram_matrix",
    oracle=f"""
    -- rid's ORDER BY must be TOTAL (vec_id, then the quantized list):
    -- the CTE is inlined into BOTH sides of the self-join, so two
    -- independent row_number evaluations run — under duplicate vec_ids
    -- a non-total order can hand the same rid to DIFFERENT copies per
    -- side, pairing copy A's dims with copy B's (caught nondeterministic
    -- on the dup x zipf replica). Ties after (vec_id, q0) are identical
    -- rows, for which either pairing yields the same products.
    WITH v0 AS (SELECT row_number() OVER (ORDER BY vec_id, {_DUCK_QV0})
                    AS rid,
                       {_DUCK_QV0} AS q0 FROM embeddings
                WHERE embedding IS NOT NULL),
    ve0 AS (SELECT rid, i, q0[i] AS q FROM v0, range(1, {DIMS + 1}) r(i))
    SELECT a.i AS dim_i, b.i AS dim_j,
           CAST(SUM(a.q * b.q) AS BIGINT) AS s
    FROM ve0 a JOIN ve0 b ON a.rid = b.rid AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The X^T X gram matrix of the (quantized) embedding corpus — the
    O(N * d^2) distributed pass that dominates PCA / whitening / linear
    probing at scale; the d x d result is then eigen-decomposed on the
    driver in microseconds (tall-skinny PCA, the standard split).

    Every ROW is one observation — the oracle self-joins the unnested
    dims on a synthetic per-row id, not on vec_id, so duplicate vec_ids
    (r12 dup replica) contribute their own v·vT each instead of bogus
    cross-copy terms. Upper triangle only (the matrix is symmetric):
    d(d+1)/2 = 2080 cells. Each partition computes its PARTIAL gram with chunked float64
    BLAS matmuls that are exact (chunk 2048: every cell sum <= 2048 *
    1.1e12 = 2.3e15 < 2^53 — no rounding) accumulated into an int64
    matrix, and emits just 2080 (i, j, s) rows — no per-vector d^2
    explode, and the one shuffle carries partitions x 2080 rows
    regardless of N. Exact BIGINT end to end (the int64 accumulator
    holds ~8M vectors per partition at this grid; rescale for more), so
    the oracle hash-verifies all 2080 accumulations.
    """
    import pandas as pd

    # NULL embeddings contribute nothing to X^T X; excluded explicitly on
    # both engines (np.vstack would crash on None rows otherwise).
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.expr(_QV0).alias("q0"))
    )

    def partial_gram(batches):
        import numpy as np

        acc = np.zeros((DIMS, DIMS), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            Q = np.vstack(pdf["q0"].to_numpy()).astype(np.float64)
            for lo in range(0, len(Q), 2048):
                c = Q[lo:lo + 2048]
                acc += (c.T @ c).astype(np.int64)  # exact: chunk sums < 2^53
        if not seen:
            return
        iu = np.triu_indices(DIMS)
        yield pd.DataFrame(
            {"dim_i": iu[0] + 1, "dim_j": iu[1] + 1, "p": acc[iu]}
        )

    cells = e.mapInPandas(partial_gram, schema="dim_i long, dim_j long, p long")
    return cells.groupBy("dim_i", "dim_j").agg(F.sum("p").alias("s"))


# --- statistic variants of the pair/cell enumerations ----------------------
# VERDICT r9 'do this' #4: the two remaining 100x stress timeouts are
# quadratic-OUTPUT pair enumerations (dedup_embedding_cosine,
# dedup_simhash). The r9 join_interval_overlap rewrite proved the right
# question is "does the consumer need the PAIRS, or a STATISTIC?" — for
# the dominant dedup consumer (how many vectors would dedup drop, and
# what do the duplicate clusters look like), the answer is a statistic
# computable with ONE linear group-by, no enumeration. The enumeration
# operators stay for consumers that need the stream (the audit twins do).


@query(
    "dedup_embedding_stats",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, {_DUCK_QV0} AS q0
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (SELECT q0, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM v GROUP BY q0)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS n_vectors,
           CAST(COUNT(*) * (cluster_size * (cluster_size - 1) // 2)
                AS BIGINT) AS n_dup_pairs
    FROM s GROUP BY cluster_size
    """,
)
def dedup_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram of the embedding corpus —
    the de-quadraticized answer to dedup_embedding_cosine's dominant
    consumer question ("how much duplication, in what cluster shapes?").

    Vectors are grouped by their exact 2^20-grid fixed-point code (the
    same _QV0 grid every checked vector op uses), so bit-identical and
    grid-identical duplicates — the structure that makes the 100x clone
    replica's pair output quadratic — collapse to ONE row per cluster,
    and the histogram costs two hash aggregations on one scan: output
    rows = distinct cluster sizes, never pairs. n_dup_pairs reports the
    C(k,2) pair mass the enumeration WOULD emit, so a pipeline can
    budget (or skip) the exact pair pass before running it.

    Scale: linear; the wide group key (the 64-long code) partial-aggs
    map-side and the second agg carries one row per distinct vector.
    NULL embeddings are excluded explicitly on BOTH engines (Spark and
    DuckDB agree on NULL grouping, but a NULL vector is not a dup).
    """
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.expr(_QV0).alias("q0"))
    )
    sizes = v.groupBy("q0").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).alias("n_vectors"),
        (
            F.count("*")
            * F.expr("cluster_size * (cluster_size - 1) div 2")
        ).alias("n_dup_pairs"),
    )


@query(
    "embed_gram_norms",
    oracle=f"""
    WITH v0 AS (
        SELECT vec_id, {_DUCK_QV0} AS q0
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = {DIMS}
    ),
    ve AS (SELECT CAST(i AS BIGINT) AS dim, q0[i] AS q
           FROM v0, range(1, {DIMS + 1}) r(i))
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           CAST(SUM(q * q) AS BIGINT) AS sum_q2
    FROM ve GROUP BY dim
    """,
)
def embed_gram_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension gram DIAGONAL (column sums + sums of squares) on
    the exact fixed-point grid — the statistic variant of
    embed_gram_matrix for the consumers that only need scaling factors
    (feature standardization, whitening diagonals, column-norm pruning):
    O(N*d) work, d rows out, exact BIGINT end to end (q^2 <= 1.33e12,
    so int64 holds ~6.9e6 vectors per dimension; the full d x d matrix
    stays available for PCA consumers).

    Plan: one scan -> posexplode -> hash agg (64 groups, map-side
    partial combine), one 64-row shuffle. NULL embeddings excluded on
    both engines: Spark's posexplode DROPS null-array rows while
    DuckDB's lateral range join would keep them as NULL cells — the
    explicit filter pins one semantic for both. The size guard (ADVICE
    r10 #5) closes the RAGGED case the same way: a short vector would
    posexplode into fewer cells on Spark but still produce {DIMS}
    (partly NULL, still COUNTed) rows under the lateral range join.
    """
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNotNull() & (F.size("embedding") == DIMS)
        )
        .select(F.expr(_QV0).alias("q0"))
    )
    v = e.select(F.posexplode("q0").alias("i", "q"))
    return v.groupBy((F.col("i") + 1).cast("long").alias("dim")).agg(
        F.count("*").alias("n_vectors"),
        F.sum("q").alias("sum_q"),
        F.sum(F.col("q") * F.col("q")).alias("sum_q2"),
    )


def _duck_floordiv_pow2(val: str, maxabs_cte: str) -> str:
    """Exact floor division of ``val`` by the power of two held in
    ``maxabs_cte``'s single row (column p) — the two's-complement-safe
    form both engines agree on for negatives."""
    return f"({val} - ((({val}) % p) + p) % p) // p"


@query(
    "embed_pca_power",
    oracle=f"""
    WITH v0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id, {_DUCK_QV0})
                    AS rid,
                       {_DUCK_QV0} AS q0 FROM embeddings
                WHERE embedding IS NOT NULL),
    ve0 AS MATERIALIZED (SELECT rid, i, q0[i] AS q FROM v0, range(1, {DIMS + 1}) r(i)),
    g_up AS MATERIALIZED (SELECT a.i AS di, b.i AS dj,
                    CAST(SUM(a.q * b.q) AS BIGINT) AS s
             FROM ve0 a JOIN ve0 b ON a.rid = b.rid AND a.i <= b.i
             GROUP BY a.i, b.i),
    g_full AS MATERIALIZED (SELECT di AS i, dj AS j, s FROM g_up
               UNION ALL
               SELECT dj, di, s FROM g_up WHERE di < dj),
    gp AS (SELECT (1::BIGINT << greatest(0,
               length(bin(COALESCE(MAX(abs(s)), 0))) - 24)) AS p
           FROM g_full),
    g2 AS MATERIALIZED (SELECT i, j, (s - ((s % p) + p) % p) // p AS g
           FROM g_full, gp),
    w1 AS (SELECT i, CAST(SUM(g) AS BIGINT) AS w FROM g2 GROUP BY i),
    p1 AS (SELECT (1::BIGINT << greatest(0,
               length(bin(COALESCE(MAX(abs(w)), 0))) - 20)) AS p
           FROM w1),
    v1 AS (SELECT i AS j, (w - ((w % p) + p) % p) // p AS v FROM w1, p1),
    w2 AS (SELECT g2.i, CAST(SUM(g2.g * v1.v) AS BIGINT) AS w
           FROM g2 JOIN v1 ON g2.j = v1.j GROUP BY g2.i),
    p2 AS (SELECT (1::BIGINT << greatest(0,
               length(bin(COALESCE(MAX(abs(w)), 0))) - 20)) AS p
           FROM w2),
    v2 AS (SELECT i AS j, (w - ((w % p) + p) % p) // p AS v FROM w2, p2),
    w3 AS (SELECT g2.i, CAST(SUM(g2.g * v2.v) AS BIGINT) AS w
           FROM g2 JOIN v2 ON g2.j = v2.j GROUP BY g2.i),
    p3 AS (SELECT (1::BIGINT << greatest(0,
               length(bin(COALESCE(MAX(abs(w)), 0))) - 20)) AS p
           FROM w3),
    v3 AS (SELECT i AS j, (w - ((w % p) + p) % p) // p AS v FROM w3, p3)
    SELECT j AS dim, v AS component FROM v3
    """,
)
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by POWER
    ITERATION on the exact-integer gram matrix — the iterative-
    linear-algebra member of the family (tall-skinny PCA: one O(N*d^2)
    distributed pass builds X^T X, then the d x d eigenproblem is
    corpus-size-independent). Three fixed iterations from the all-ones
    vector, entirely in BIGINT, so the trajectory is bit-identical on
    both engines and hash-adjudicable — no float eigensolver whose
    convergence/rounding could differ:

    * the gram is the proven-exact embed_gram_matrix pass (chunked
      int64-accumulated BLAS partials, one 2080-cell shuffle);
    * before iterating, G is floor-divided by a power of two keeping
      its top 24 bits; each iterate is renormalized the same way to 20
      bits (shift = bitlength(max|w|) - 20). The overflow audit:
      |G'| < 2^24, |v| < 2^21, so each matvec component is at most
      64 * 2^24 * 2^21 = 2^51 — no BIGINT wrap at ANY corpus size
      (scale enters only through G's magnitude, absorbed by its
      shift);
    * floor division uses the pmod form on both engines (verified:
      Spark ``(w - pmod(w, p)) div p`` == DuckDB
      ``(w - ((w%p)+p)%p) // p`` == -2 for w=-7, p=4), because bare
      integer division truncates toward zero in both and would round
      negatives the other way.

    The sign/scale convention is therefore deterministic-by-
    construction (ones start, fixed shifts), and downstream consumers
    (whitening, spectral outlier pruning) re-normalize anyway.

    Scale shape: the ONLY corpus-sized work is the gram pass (reused,
    session-persisted on the embeddings fingerprint); the three
    iterations are joins over a 4096-row broadcastable relation with
    1-row broadcast shift factors — constant cost at any N."""
    import os

    from databricks_feature_store_poc_spark.cacheutil import session_persist

    cells = session_persist(
        spark,
        "pca_gram_cells",
        [os.path.join(sf_dir, "embeddings.parquet")],
        embed_gram_matrix(spark, sf_dir),
    )
    up = cells.select(
        F.col("dim_i").alias("i"), F.col("dim_j").alias("j"), "s"
    )
    full = up.unionAll(
        cells.where(F.col("dim_i") < F.col("dim_j")).select(
            F.col("dim_j").alias("i"), F.col("dim_i").alias("j"), "s"
        )
    )

    def pow2_keep(df: DataFrame, col: str, keep: int) -> DataFrame:
        """1-row (p) relation: 2^max(0, bitlen(max|col|) - keep)."""
        return df.agg(
            F.expr(
                f"shiftleft(cast(1 as bigint), greatest(0, "
                f"length(bin(coalesce(max(abs({col})), 0))) - {keep}))"
            ).alias("p")
        )

    # localCheckpoint (r17 optimization): g2 is referenced FOUR times —
    # the w0 init plus each matvec join — and without truncation every
    # reference re-plans and re-executes the union + broadcast-shift
    # subtree above it (measured 63 Spark jobs for one noop run of this
    # query; guide §5 "localCheckpoint is a cheaper way to cut
    # lineage"). The table is d x d = 4096 cells at ANY corpus size —
    # constant-size state, corpus cost stays in the (session-persisted)
    # gram pass.
    g2 = full.crossJoin(F.broadcast(pow2_keep(full, "s", 24))).select(
        "i", "j", F.expr("(s - pmod(s, p)) div p").alias("g")
    ).transform(_ckpt)
    w = g2.groupBy("i").agg(F.sum("g").cast("long").alias("w"))
    for _ in range(3):
        v = w.crossJoin(F.broadcast(pow2_keep(w, "w", 20))).select(
            F.col("i").alias("j"),
            F.expr("(w - pmod(w, p)) div p").alias("v"),
        )
        w = (
            g2.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).cast("long").alias("w"))
        )
    # after 3 loop turns v holds the third renormalized iterate (the
    # final w = G*v3 is never consumed — lazy, so never computed)
    return v.select(F.col("j").alias("dim"), F.col("v").alias("component"))
