"""Iterative graph analytics over the relational tables: PageRank.

A 100 TB training-data pipeline routinely needs link-graph signals
(page/domain authority for web-corpus quality weighting — the reference
class of curation signal popularized by the C4/CCNet pipelines). This
module implements PageRank as iterated DataFrame joins — the classic
Spark formulation — with one deliberate twist that makes it
driver-adjudicable: **fixed-point integer arithmetic**.

Why fixed-point: PageRank in doubles sums in-neighbor contributions,
and double addition is not associative — the result depends on Spark's
partition/merge order AND diverges from any oracle engine at the last
few ulps. Scaling ranks to BIGINT "rank units" (1e12 = total mass) and
using integer division makes every step exact, order-free, and
bit-identical across Spark, DuckDB, and any partitioning — the same
trick the oracle contract uses for decimal sums (registry.py docstring).

Graph: the customer–supplier bipartite graph implied by orders x
lineitem (who buys from whom), made bidirectional so every node has
out-degree >= 1 (no dangling-mass redistribution needed — at scale,
dangling handling adds one broadcast scalar per iteration).

Scale notes:
- The edge list is session-persisted (the GraphX edge-cache move) and
  keyed by INTEGER node ids — display labels are built only on the
  final top-k.
- Each iteration is one join against the small rank table (AQE
  broadcasts it) plus one groupBy(dst) shuffle of the contributions.
- The iteration count is fixed (3) — the plan is static and lazy; no
  driver-side convergence loop, no collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.cacheutil import (
    tracked_local_checkpoint as _ckpt,
)
from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

SCALE = 1_000_000_000_000  # 1e12 rank units of total mass
ITERS = 3
TOPK = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer->supplier edges from orders x lineitem, plus the
    reverse direction (bidirectional => no dangling nodes).

    The edge list is referenced in every iteration's join; it is
    session-persisted (standard iterative-graph practice — GraphX caches
    its edge RDD the same way) so the orders x lineitem join + distinct
    runs once per corpus per session, not once per plan reference."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Integer node ids while iterating (customer k -> 2k, supplier k ->
    # 2k+1): bigint joins/aggregates shuffle a fraction of what string
    # keys cost; the display label is built once on the final top-k.
    ce = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = ce.unionByName(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # r18 (VERDICT r17 'what's wrong' #2): the r17 pre-partition-on-src
    # before persist was REVERTED. It was the right 100 TB shape only
    # under spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=
    # false; under the session default (true — kept because it lets AQE
    # right-size tiny caches like the shingle index), AQE re-partitions
    # the cached plan anyway, so the repartition added an extra Exchange
    # at cache-build (pagerank plan 64 -> 72 Exchanges) for a measured-
    # neutral-at-best effect (r17 A/B 1.015, r18 matched A/B of the
    # revert below). On a real cluster that pins the conf to false for
    # partitioning-reuse pipelines, re-adding `.repartition("src")` here
    # (one line) makes the edge cache behave like a bucketed table
    # (guide §2.4) so each pagerank iteration moves only the |V| rank
    # side — that deployment note lives in OPTIMIZATION_r17/18.md; the
    # local default keeps the plan one Exchange smaller.
    from databricks_feature_store_poc_spark.cacheutil import session_persist

    return session_persist(
        spark,
        "pagerank_edges",
        [os.path.join(sf_dir, "orders.parquet"), os.path.join(sf_dir, "lineitem.parquet")],
        edges,
    )


def pagerank(edges: DataFrame, iters: int = ITERS) -> DataFrame:
    """Fixed-point PageRank (damping 0.85) over a bidirectional
    (src, dst) edge list.

    Returns (node, rank) with rank in integer rank units. Every node
    appears as a src (bidirectional contract), so out-degree is total.
    The out-degree is folded into the |nodes|-row rank table (a tiny
    node-keyed join), so each iteration is one join of the cached edge
    list against that small table — AQE broadcasts it — plus one
    groupBy(dst) shuffle of the contributions.
    """
    # localCheckpoint (r15, same move as graph_bfs_reach): deg is
    # referenced by rank0, by every iteration's share join, and by the
    # n1 broadcast — lazily each reference re-runs the |E| groupBy over
    # the cached edge list (~8 executions at 3 iterations). The
    # checkpointed table is |V|-row.
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")
    ).transform(_ckpt)
    n1 = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # rank0 = SCALE div N; teleport base = (15 * (SCALE div N)) div 100.
    ranks = deg.crossJoin(F.broadcast(n1)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({SCALE} AS BIGINT) div n").alias("rank"),
    )
    for _ in range(iters):
        shares = ranks.join(deg, ranks["node"] == deg["src"]).select(
            F.col("node"), F.expr("rank div outdeg").alias("contrib")
        )
        contribs = (
            edges.join(shares, edges["src"] == shares["node"])
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inbound"))
        )
        ranks = contribs.crossJoin(F.broadcast(n1)).select(
            F.col("dst").alias("node"),
            F.expr(
                f"(15 * (CAST({SCALE} AS BIGINT) div n)) div 100"
                " + (85 * inbound) div 100"
            ).alias("rank"),
        )
    return ranks


@query(
    "graph_pagerank",
    oracle=f"""
    WITH ce AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT src, dst FROM ce
        UNION ALL
        SELECT dst AS src, src AS dst FROM ce
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) // nn.n AS rank FROM deg, nn),
    r1 AS (
        SELECT e.dst AS node,
               CAST((15 * (CAST({SCALE} AS BIGINT) // nn.n)) // 100
                    + (85 * SUM(r.rank // d.outdeg)) // 100 AS BIGINT) AS rank
        FROM edges e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src, nn
        GROUP BY e.dst, nn.n
    ),
    r2 AS (
        SELECT e.dst AS node,
               CAST((15 * (CAST({SCALE} AS BIGINT) // nn.n)) // 100
                    + (85 * SUM(r.rank // d.outdeg)) // 100 AS BIGINT) AS rank
        FROM edges e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src, nn
        GROUP BY e.dst, nn.n
    ),
    r3 AS (
        SELECT e.dst AS node,
               CAST((15 * (CAST({SCALE} AS BIGINT) // nn.n)) // 100
                    + (85 * SUM(r.rank // d.outdeg)) // 100 AS BIGINT) AS rank
        FROM edges e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src, nn
        GROUP BY e.dst, nn.n
    )
    SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT {TOPK}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOPK} PageRank nodes of the customer–supplier graph after 3
    exact fixed-point iterations. The DuckDB oracle unrolls the identical
    integer recurrence in CTEs, so the driver hash-verifies every
    division and summation of the iteration — not just the final shape.
    All quantities are bounded: contributions sum to <= SCALE (1e12)
    globally, so 85 * sum stays far inside BIGINT at any graph size.
    """
    ranks = pagerank(_edges(spark, sf_dir)).select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint").cast("string"))
        )
        .alias("node"),
        "rank",
    )
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(TOPK)


JACCARD_TOPK = 20
# Hub cap: customers connected to more than this many suppliers are
# dropped from the bipartite projection BEFORE the pair self-join. The
# pair join emits deg²/2 rows per customer, so one hub customer joined
# to everything is a straight scale-killer — and a customer connected
# to everything predicts nothing (the same information-theoretic
# argument as dedup_ngram_jaccard's DF_CAP stop-shingles). 256 is far
# above the real per-customer supplier degree at every test SF (max 102
# at sf0.1, 67 at sf0.01), so capped and uncapped results are
# bit-identical on the testdata; at corpus scale it bounds the worst
# per-customer pair fanout at 256²/2 ≈ 33k rows. The cap is
# deterministic, so the DuckDB oracle applies the identical filter and
# the query stays hash-adjudicable.
JACCARD_HUB_CAP = 256


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH bip0 AS (
        -- NULL endpoints carry no graph identity (r11 contract): a NULL
        -- customer is not one entity shared by its suppliers, and the
        -- engines disagree on NULL grouping vs NULL equi-joins
        SELECT DISTINCT o.o_custkey AS c, li.l_suppkey AS s
        FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
        WHERE o.o_custkey IS NOT NULL AND li.l_suppkey IS NOT NULL
    ),
    cdeg AS (
        SELECT c FROM bip0 GROUP BY c
        HAVING count(*) <= {JACCARD_HUB_CAP}
    ),
    bip AS (SELECT bip0.c, bip0.s FROM bip0 JOIN cdeg ON bip0.c = cdeg.c),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM bip GROUP BY s),
    w AS (
        SELECT a.s AS x, b.s AS y, CAST(count(*) AS BIGINT) AS shared
        FROM bip a JOIN bip b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    )
    SELECT w.x, w.y, w.shared,
           CAST(w.shared AS DOUBLE)
               / CAST(dx.d + dy.d - w.shared AS DOUBLE) AS jaccard
    FROM w JOIN deg dx ON dx.s = w.x JOIN deg dy ON dy.s = w.y
    ORDER BY jaccard DESC, w.x, w.y
    LIMIT {JACCARD_TOPK}
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction: the top-{JACCARD_TOPK}
    supplier pairs by Jaccard similarity of their customer sets —
    |N(x) ∩ N(y)| / |N(x) ∪ N(y)| over the customer–supplier bipartite
    projection. The "suppliers like this one" / co-purchase
    recommendation primitive.

    Exactness: intersection and degrees are BIGINT; the union comes from
    inclusion–exclusion (dx + dy - shared), so Jaccard is ONE division
    of exact integers — bit-identical on both engines, ranked with
    (x, y) tie-breaks.

    Plan: ONE linear pipeline with no recomputation — the hub cap and
    the supplier degrees are WINDOW counts chained onto the projection
    (count over partitionBy(c) → filter degree <= {JACCARD_HUB_CAP} →
    count over partitionBy(s) carried on every row), so the capped,
    degree-annotated projection is a single subtree. The pair
    self-join's two sides are that identical subtree, materialized ONCE
    via localCheckpoint (r17: the plan audit showed ReuseExchange does
    not fire here — the per-side rename projections defeat exchange
    canonicalization, so the projection executed twice before). Because
    each row already carries its supplier's degree,
    the pair groupBy aggregates dx/dy with MAX (degree is functionally
    dependent on the supplier) and the two post-hoc degree joins
    disappear entirely; TakeOrderedAndProject serves the top-k. At
    100 TB the self-join's per-customer deg² blowup is the scale
    hazard, so the hub cap is IN THE PLAN: customers with bipartite
    degree > {JACCARD_HUB_CAP} are filtered out of the projection
    before the pair join (see JACCARD_HUB_CAP above — identical filter
    in the oracle, results unchanged at every test SF, worst-case pair
    fanout bounded). Corpora where even capped exact counting is too
    dense move to the MinHash route in llm/dedup.py; here the
    projection is exact.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    bip0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            F.col("o_custkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    bip = (
        bip0.withColumn(
            "cd", F.count(F.lit(1)).over(Window.partitionBy("c"))
        )
        .filter(F.col("cd") <= JACCARD_HUB_CAP)
        .withColumn(
            "d", F.count(F.lit(1)).over(Window.partitionBy("s")).cast("long")
        )
        .drop("cd")
        # localCheckpoint (r17): the pair self-join's two sides are this
        # identical subtree, but the r17 plan audit showed ReuseExchange
        # does NOT fire (the rename projections above the exchange defeat
        # canonicalization — 0 ReusedExchange nodes), so the orders x
        # lineitem join + distinct + both degree windows executed TWICE.
        # Materialized once: O(bipartite edges) rows, the projection this
        # pipeline holds anyway.
        .transform(_ckpt)
    )
    a = bip.select("c", F.col("s").alias("x"), F.col("d").alias("dx"))
    b = bip.select("c", F.col("s").alias("y"), F.col("d").alias("dy"))
    w = (
        a.join(b, (a["c"] == b["c"]) & (a["x"] < b["y"]))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared"),
            F.max("dx").alias("dx"),
            F.max("dy").alias("dy"),
        )
    )
    return (
        w.select(
            "x", "y", "shared",
            (
                F.col("shared").cast("double")
                / (F.col("dx") + F.col("dy") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("x"), F.asc("y"))
        .limit(JACCARD_TOPK)
    )


BFS_HOPS = 3
BFS_SOURCES = 10


@query(
    "graph_bfs_reach",
    oracle=f"""
    WITH ce AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM ce
        UNION ALL
        SELECT dst AS src, src AS dst FROM ce
    ),
    srcs AS MATERIALIZED (
        SELECT o_custkey * 2 AS node
        FROM (SELECT o_custkey, count(*) AS c FROM orders
              WHERE o_custkey IS NOT NULL
              GROUP BY 1 ORDER BY c DESC, o_custkey LIMIT {BFS_SOURCES})
    ),
    v0 AS MATERIALIZED (SELECT node FROM srcs),
    f1 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN v0 ON v0.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM v0)),
    v1 AS MATERIALIZED (SELECT node FROM v0 UNION SELECT node FROM f1),
    f2 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN f1 ON f1.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM v1)),
    v2 AS MATERIALIZED (SELECT node FROM v1 UNION SELECT node FROM f2),
    f3 AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM edges e
           JOIN f2 ON f2.node = e.src
           WHERE e.dst NOT IN (SELECT node FROM v2)),
    v3 AS MATERIALIZED (SELECT node FROM v2 UNION SELECT node FROM f3)
    SELECT CAST(1 AS INT) AS hop,
           (SELECT CAST(count(*) AS BIGINT) FROM f1) AS n_frontier,
           (SELECT CAST(count(*) AS BIGINT) FROM v1) AS n_visited
    UNION ALL
    SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM f2),
              (SELECT CAST(count(*) AS BIGINT) FROM v2)
    UNION ALL
    SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM f3),
              (SELECT CAST(count(*) AS BIGINT) FROM v3)
    """,
)
def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the customer-supplier bipartite graph — the
    neighborhood-expansion workload (influence/blast-radius queries,
    label propagation seeding, contamination spread) that pagerank's
    mass iteration and jaccard's pair scoring don't cover: from the
    top-{BFS_SOURCES} customers by order count (ties broken by key —
    total order), expand {BFS_HOPS} hops and report each hop's frontier
    size and cumulative visited count.

    Frontier algebra is exact set arithmetic on integer node ids:
    frontier(h+1) = distinct neighbors of frontier(h) minus everything
    visited — expressed as a join + left_anti per hop (the Pregel step
    in DataFrame form), so results are partition-order-free and the
    DuckDB oracle unrolls the identical three steps. NULL endpoints
    carry no graph identity (r11 contract) and are excluded from the
    edge relation on both engines.

    Scale shape: the (cached) edge list is the only corpus-sized
    relation; each hop shuffles the frontier/visited NODE sets (bounded
    by |V|, not |E|) through one join + one anti-join + one distinct.
    Hop count is fixed -> static per-hop plans, no driver loop state,
    no collect. Each hop's frontier set is `localCheckpoint()`ed
    (eager, lineage-truncating) before the count aggregates and the
    next hop are derived: without it, the hop-3 counts plus the
    hop-2/3 join, anti-join and union all re-execute the full upstream
    expansion (the DuckDB oracle needs MATERIALIZED CTEs for exactly
    the same reason) — checkpointing makes each hop's expansion run
    exactly once. The visited set is the plain union of the
    checkpointed frontiers (disjoint by the anti-join, each internally
    distinct, so no dedup shuffle and no second checkpoint per hop is
    needed — r17). The checkpointed state is node-set sized (bounded
    by |V|), so the materialization cost is tiny next to the joins it
    eliminates. On a frontier approaching |V| (this
    dense bipartite graph saturates by hop 2-3), the anti-join's build
    side is the visited set — broadcastable while |visited| is small,
    hash-join after; AQE picks per hop."""
    edges = _edges(spark, sf_dir).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    o = load_table(spark, sf_dir, "orders")
    sources = (
        o.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("o_custkey"))
        .limit(BFS_SOURCES)
        .select((F.col("o_custkey") * 2).alias("node"))
    )
    frontier = _ckpt(sources)
    visited = frontier
    hops = []
    for hop in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .transform(_ckpt)
        )
        # visited(h) = visited(h-1) ∪ frontier(h): the two sides are
        # DISJOINT (the anti-join above removed everything visited) and
        # each internally distinct, so the bare union IS the distinct
        # union — the .distinct() the oracle's UNION expresses is a
        # no-op here and its per-hop shuffle + the extra checkpoint job
        # were pure overhead (r17 optimization; union of checkpointed
        # node sets re-reads in-memory partitions, nothing recomputes).
        visited = visited.unionByName(frontier)
        hops.append(
            frontier.agg(F.count(F.lit(1)).cast("long").alias("n_frontier"))
            .crossJoin(
                F.broadcast(
                    visited.agg(
                        F.count(F.lit(1)).cast("long").alias("n_visited")
                    )
                )
            )
            .select(
                F.lit(hop).cast("int").alias("hop"),
                "n_frontier",
                "n_visited",
            )
        )
    out = hops[0]
    for h in hops[1:]:
        out = out.unionByName(h)
    return out
