"""One-off FULL-registry oracle gate at 100x clones (VERDICT r12 #3).

The only-at-scale oracle-defect class (SURVEY §6's 2x bar; the r8
ULP-past-2^53 and nested-loop traps) was enumerated for decimal casts
only, and the 100x replica (/tmp/spark_graft_stress100x_full — 100
clones of sf0.1, ~60M-row lineitem ~= sf10) has never seen the whole
registry. This script runs it once, recorded, like the quarterly
full-10x.

Design deltas vs tests/harness.py (which collects BOTH engines' full
output into Python — fine at sf0.1, not at 60M-row outputs):

- per-query wall cap (GATE_TIMEOUT, default 600 s; 3x for the
  heavy-intermediate verifiers) enforced by a Spark job-group cancel +
  DuckDB interrupt, so a planner bomb records a timeout instead of
  hanging the sweep; the phase the timer fired in (spark-count /
  oracle-count / spark-collect / oracle-fetch / ...) is recorded so a
  red is adjudicable without a re-run (ADVICE r13);
- queries whose output exceeds GATE_CAP_ROWS (default 2M) are compared
  on COUNT plus an order-insensitive VALUE hash of a deterministic
  ~0.1% md5-prefix sample of a stable key column (mode="count+sample",
  VERDICT r13 #6) — both engines filter on the identical
  substr(md5(CAST(col AS VARCHAR)),1,3) predicate, so at-scale value
  corruption is caught, not just cardinality; when no engine-stable
  sample column exists or the sample itself exceeds the collect cap,
  the row degrades to mode="count-only" with the reason inline;
- quadratic-OUTPUT queries (the stress sweep's QUADRATIC_OUTPUT set)
  that hit the oracle memory cap, fill the spill quota (the r13
  ENOSPC death on dedup_semantic_cluster: DuckDB spills to disk
  BEFORE raising OutOfMemory, so capacity deaths arrive as
  IOException "No space left on device" — ADVICE r13), or time out
  are recorded oom/timeout_explained, same adjudication as
  scripts/stress_registry_10x.py: at 100 clones every cross-clone
  duplicate is a TRUE pair, so their work volume is ~(100 choose 2)x
  — volume, not plan shape;
- ORACLE-HEAVY-INTERMEDIATE queries (VERDICT r13 #1b) — linear OUTPUT
  but the monolithic DuckDB oracle's INTERMEDIATE exceeds any
  reasonable cap at 100x — get dedicated verifiers instead of the
  registered one-shot SQL:
    * graph_pagerank: the identical integer recurrence materialized
      STEPWISE (one temp table per iteration, so peak memory is one
      join pass, not three inlined CTE chains) and hash-compared
      against the engine top-k; plus the mass-conservation invariant
      (total rank within the integer-division loss bound of SCALE,
      the tests/test_round6.py property) run engine-side at 100x. If
      even the stepwise oracle dies on capacity, the invariants +
      output-shape checks record mode="heavy-intermediate".
    * dedup_semantic_cluster: the data-dependent half of the output
      (k-means cluster ids + member counts) is hash-verified against
      the cheap linear oracle (the registered _KMEANS_CTES, which
      passed standalone as cluster_kmeans at 100x in 14 s); the pair
      counts — whose oracle is Sigma |c|^2 x DIMS join rows at 100x,
      capacity-infeasible for ANY exact engine — are bound-checked
      (pairs <= C(n,2), victims <= pairs, victims <= n-1, cluster
      sizes partition the distinct-vector universe) and their VALUES
      stay hash-gated at sf<=0.1 + the 10x stress artifact.
- results stream to scripts/gate100x_results.jsonl as they land (the
  sweep is ~hours; partial progress must survive) and a summary goes
  to scripts/gate100x_summary.json. Resume semantics (ADVICE r13):
  GATE_RESUME skips only queries whose LATEST record is ok=true —
  prior FAILs re-run; the summary's failed list and the exit code are
  derived from the results FILE (latest record per name), not just
  the current process, so a resumed run cannot mask a standing red.
  GATE_ONLY without GATE_RESUME writes to a separate
  gate100x_results_only.jsonl and never truncates the main sweep
  record.

Usage:
    python scripts/gate100x.py                  # full registry
    GATE_ONLY=tpch_q1,agg_stats python scripts/gate100x.py
    GATE_RESUME=1 python scripts/gate100x.py    # re-run everything not
                                                # already recorded green
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from databricks_feature_store_poc_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from tests.harness import duckdb_conn, value_hash  # noqa: E402

DST = os.environ.get("GATE_SF_DIR", "/tmp/spark_graft_stress100x_full")
TIMEOUT = float(os.environ.get("GATE_TIMEOUT", "600"))
CAP_ROWS = int(os.environ.get("GATE_CAP_ROWS", "2000000"))
RESULTS = os.path.join(REPO, "scripts", "gate100x_results.jsonl")
RESULTS_ONLY = os.path.join(REPO, "scripts", "gate100x_results_only.jsonl")
SUMMARY = os.path.join(REPO, "scripts", "gate100x_summary.json")

# Oracle capacity rails: without a memory cap a quadratic oracle grows
# until the OS kills the whole gate (observed r12: 111 GB RSS SIGKILL);
# with only a memory cap DuckDB spills to an UNBOUNDED temp dir until
# the disk fills (observed r13: ENOSPC on dedup_semantic_cluster, the
# root filesystem at 0 bytes free). Cap both, in a dedicated directory.
ORACLE_MEM = os.environ.get("GATE_ORACLE_MEM", "24GB")
SPILL_DIR = os.environ.get("GATE_SPILL_DIR", "/tmp/gate100x_spill")
SPILL_CAP = os.environ.get("GATE_SPILL_CAP", "40GB")

# count+sample (VERDICT r13 #6): deterministic ~0.1% sample via
# substr(md5(CAST(col AS VARCHAR)),1,3) <= '003' (4/4096 of the md5
# space). Only dtypes whose VARCHAR rendering is bit-identical across
# Spark and DuckDB qualify as the sample key (integers and strings;
# floats/decimals/timestamps format differently).
SAMPLE_TYPES = {"bigint", "int", "smallint", "tinyint", "string"}
SAMPLE_PREFIX = "003"
SAMPLE_CAP = int(os.environ.get("GATE_SAMPLE_CAP", "200000"))

# mirror of scripts/stress_registry_10x.py CLONE_DEGENERATE_ZERO —
# rows-only queries whose 0-row output at high clone counts is the
# DF cap doing its job (every shingle's df is ~CLONES x its original,
# exceeding DF_CAP=50, so stop-shingle removal empties the inverted
# index; identical clones are dedup_exact's work)
CLONE_DEGENERATE_ZERO = {"dedup_ngram_jaccard", "dedup_near_minhash"}

# mirror of scripts/stress_registry_10x.py QUADRATIC_OUTPUT — queries
# whose OUTPUT (or, for dedup_semantic_cluster, whose within-cluster
# pair WORK) is inherently ~C^2 on a cloned corpus
QUADRATIC_OUTPUT = {
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_simhash_audit",
    "dedup_minhash_audit",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_semantic_cluster",
    "join_interval_overlap",
    "text_span_dedup",
}


class _Timeout(Exception):
    pass


def gate_con(dst: str) -> duckdb.DuckDBPyConnection:
    """harness duckdb_conn + the gate's capacity rails."""
    con = duckdb_conn(dst)
    os.makedirs(SPILL_DIR, exist_ok=True)
    con.sql(f"SET memory_limit='{ORACLE_MEM}'")
    con.sql(f"SET temp_directory='{SPILL_DIR}'")
    con.sql(f"SET max_temp_directory_size='{SPILL_CAP}'")
    return con


def _capacity_error(exc: Exception) -> bool:
    """Oracle-capacity death: OOM at the memory cap, spill-quota hit,
    or disk-full while spilling (DuckDB spills to disk BEFORE raising
    OutOfMemory, so ENOSPC / temp-storage IOException is the same
    failure arriving through the filesystem — ADVICE r13)."""
    m = str(exc).lower()
    return (
        "utofmemory" in m
        or "memory limit" in m
        or "no space left" in m
        or "temp_directory" in m
        or "temp directory" in m
        or "duckdb_temp_storage" in m
    )


# --- oracle-heavy-intermediate verifiers (VERDICT r13 #1b) -----------------


def _verify_pagerank(spark, df, rec: dict, state: dict) -> dict:
    """graph_pagerank at 100x: the registered monolithic oracle inlines
    three 120M-row edge joins into one plan and OOMs at any cap (judge
    r13: 22.3 GiB used at 438 s). Same recurrence, materialized
    stepwise — peak memory is ONE join pass — then hash-compare; plus
    the engine-side mass-conservation property at full 100x volume."""
    from pyspark.sql import functions as F

    from databricks_feature_store_poc_spark.operators.graph import (
        ITERS,
        SCALE,
        TOPK,
        _edges,
        pagerank,
    )

    rec["phase"] = "invariant-mass"
    edges = _edges(spark, DST)
    n_edges = edges.count()
    n_nodes = edges.select("src").distinct().count()
    total = pagerank(edges).agg(F.sum("rank")).collect()[0][0]
    # per iteration: <=1 unit lost per edge (contrib div), <=1 per node
    # (base div + /100 truncations, x3 terms); init loses <= n_nodes —
    # the tests/test_round6.py::test_pagerank_conserves_mass bound.
    loss_bound = ITERS * (n_edges + 3 * n_nodes) + n_nodes
    mass_ok = SCALE - loss_bound <= total <= SCALE
    rec["invariants"] = {
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "total_rank": total,
        "loss_bound": loss_bound,
        "mass_conserved": mass_ok,
    }

    rec["phase"] = "spark-collect"
    spark_rows = [tuple(r) for r in df.collect()]
    ranks = [r[1] for r in spark_rows]
    shape_ok = (
        len(spark_rows) == TOPK
        and ranks == sorted(ranks, reverse=True)
        and all(0 < r <= SCALE for r in ranks)
    )
    rec["invariants"]["topk_shape"] = shape_ok

    steps = [
        """CREATE TEMP TABLE pr_ce AS
           SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                           's' || CAST(l_suppkey AS VARCHAR) AS dst
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey""",
        """CREATE TEMP TABLE pr_edges AS
           SELECT src, dst FROM pr_ce
           UNION ALL SELECT dst AS src, src AS dst FROM pr_ce""",
        """CREATE TEMP TABLE pr_deg AS
           SELECT src, CAST(count(*) AS BIGINT) AS outdeg
           FROM pr_edges GROUP BY src""",
        f"""CREATE TEMP TABLE pr_r0 AS
            SELECT src AS node,
                   CAST({SCALE} AS BIGINT)
                       // (SELECT CAST(count(*) AS BIGINT) FROM pr_deg)
                       AS rank
            FROM pr_deg""",
    ] + [
        f"""CREATE TEMP TABLE pr_r{k} AS
            SELECT e.dst AS node,
                   CAST((15 * (CAST({SCALE} AS BIGINT)
                        // (SELECT CAST(count(*) AS BIGINT) FROM pr_deg)))
                        // 100
                        + (85 * SUM(r.rank // d.outdeg)) // 100
                        AS BIGINT) AS rank
            FROM pr_edges e
            JOIN pr_r{k - 1} r ON r.node = e.src
            JOIN pr_deg d ON d.src = e.src
            GROUP BY e.dst"""
        for k in range(1, ITERS + 1)
    ]
    try:
        rec["phase"] = "oracle-stepwise"
        con = state["con"] = gate_con(DST)
        for i, stmt in enumerate(steps):
            rec["phase"] = f"oracle-stepwise-{i}"
            con.sql(stmt)
        rec["phase"] = "oracle-fetch"
        rel = con.sql(
            f"SELECT node, rank FROM pr_r{ITERS} "
            f"ORDER BY rank DESC, node LIMIT {TOPK}"
        )
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
        match = value_hash(spark_rows, list(df.columns)) == value_hash(
            duck_rows, duck_cols
        )
        rec["mode"] = "oracle-stepwise"
        rec["ok"] = bool(match and mass_ok and shape_ok)
        if not match:
            rec["issue"] = "stepwise oracle value-hash mismatch"
        elif not (mass_ok and shape_ok):
            rec["issue"] = f"invariant failed: {rec['invariants']}"
        else:
            rec["note"] = (
                "identical integer recurrence materialized stepwise "
                "(one temp table per iteration) — full top-k hash "
                "match at 100x + mass-conservation invariant"
            )
        return rec
    except Exception as exc:
        if not _capacity_error(exc):
            raise
        rec["mode"] = "heavy-intermediate"
        rec["ok"] = bool(mass_ok and shape_ok)
        rec["note"] = (
            "stepwise oracle also hit the capacity rail "
            f"({type(exc).__name__}); adjudicated on the engine-side "
            "mass-conservation invariant (exact integer bound) + top-k "
            "shape at 100x; full hash parity holds at sf<=0.1 on 7 "
            "distributions"
        )
        if not rec["ok"]:
            rec["issue"] = f"invariant failed: {rec['invariants']}"
        return rec


def _verify_semantic_cluster(spark, df, rec: dict, state: dict) -> dict:
    """dedup_semantic_cluster at 100x: the registered oracle's pair
    CTEs are Sigma |c|^2 x DIMS join rows (~1e12 at 100x clones) —
    capacity-infeasible for ANY exact oracle engine (r13: filled the
    disk at 588 s). The data-dependent half — which cluster every
    vector lands in, and how many per cluster — IS linearly oracled
    here with the same _KMEANS_CTES that passed standalone as
    cluster_kmeans at 100x (14 s); the pair counts are bound-checked
    and their values stay hash-gated at sf<=0.1 + the 10x stress row."""
    from databricks_feature_store_poc_spark.llm.vectors import _KMEANS_CTES

    rec["phase"] = "spark-collect"
    rows = [tuple(r) for r in df.collect()]  # one row per cluster
    by = {r[0]: r for r in rows}
    bounds_ok = all(
        0 <= p <= n * (n - 1) // 2 and 0 <= v <= p and v <= max(n - 1, 0)
        for (_, n, p, v) in rows
    )

    rec["phase"] = "oracle-cluster-sizes"
    con = state["con"] = gate_con(DST)
    sizes_sql = (
        f"WITH {_KMEANS_CTES}, "
        "asgn AS (SELECT vec_id, cid FROM a2 WHERE rn = 1) "
        "SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors "
        "FROM asgn GROUP BY cid"
    )
    rel = con.sql(sizes_sql)
    duck_sizes = rel.fetchall()
    sizes_match = value_hash(
        [(r[0], r[1]) for r in rows], ["cid", "n_vectors"]
    ) == value_hash(duck_sizes, list(rel.columns))

    rec["phase"] = "oracle-universe-count"
    n_universe = con.sql(
        "SELECT count(DISTINCT vec_id) FROM embeddings "
        "WHERE embedding IS NOT NULL"
    ).fetchone()[0]
    partition_ok = sum(r[1] for r in rows) == n_universe and len(by) == len(
        rows
    )

    rec["mode"] = "heavy-intermediate"
    rec["ok"] = bool(sizes_match and bounds_ok and partition_ok)
    rec["invariants"] = {
        "cluster_sizes_hash_match": sizes_match,
        "pair_bounds_ok": bounds_ok,
        "partitions_universe": partition_ok,
        "n_clusters": len(rows),
        "n_vectors_total": sum(r[1] for r in rows),
    }
    if rec["ok"]:
        rec["note"] = (
            "cluster assignment (the data-dependent output half) "
            "hash-verified against the linear k-means oracle at 100x; "
            "pair counts bound-checked (pairs <= C(n,2), victims <= "
            "pairs, victims <= n-1, sizes partition the universe) — "
            "their exact oracle is Sigma|c|^2 x DIMS intermediate "
            "rows, infeasible at 100x for any engine; pair values "
            "hash-gated at sf<=0.1 + 10x stress"
        )
    else:
        rec["issue"] = f"invariant failed: {rec['invariants']}"
    return rec


def _verify_jaccard(spark, df, rec: dict, state: dict) -> dict:
    """graph_jaccard_neighbors at 100x: the oracle's pair self-join
    emits ~deg^2/2 rows per customer (~675M at 100 clones) before the
    group-by — the monolithic query blew the 24 GB + spill rails in
    phase oracle-count (r14 sweep). Output is top-20, so this is the
    oracle-heavy-intermediate class. Verified in two layers:

    1. VALUE exactness (always): the <=40 suppliers named in the
       engine's top-20 are re-scored EXACTLY in DuckDB on the
       hub-capped projection filtered to those suppliers (tiny:
       candidate rows only) — shared, dx, dy, and the one-division
       jaccard must match bit-for-bit.
    2. COMPLETENESS (attempted): the full pair aggregation
       materialized stepwise with an elevated spill quota; if it fits,
       the whole top-20 is hash-compared (mode oracle-stepwise). If it
       dies on capacity/timeout, the record adjudicates on layer 1 +
       shape invariants, with the attempt's failure inline."""
    from databricks_feature_store_poc_spark.operators.graph import (
        JACCARD_HUB_CAP,
        JACCARD_TOPK,
    )

    rec["phase"] = "spark-collect"
    rows = [tuple(r) for r in df.collect()]  # (x, y, shared, jaccard)
    jac = [r[3] for r in rows]
    shape_ok = (
        len(rows) == JACCARD_TOPK
        and all(0 < j <= 1.0 for j in jac)
        and all(r[0] < r[1] and r[2] >= 1 for r in rows)
        # contract order: jaccard DESC, then (x, y) ASC on ties
        and all(
            jac[i] > jac[i + 1]
            or (
                jac[i] == jac[i + 1]
                and (rows[i][0], rows[i][1])
                < (rows[i + 1][0], rows[i + 1][1])
            )
            for i in range(len(rows) - 1)
        )
    )
    rec["invariants"] = {"topk_shape": shape_ok}

    con = state["con"] = gate_con(DST)
    rec["phase"] = "oracle-candidate-values"
    con.sql(
        """CREATE TEMP TABLE gj_bip AS
           SELECT DISTINCT o.o_custkey AS c, li.l_suppkey AS s
           FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
           WHERE o.o_custkey IS NOT NULL AND li.l_suppkey IS NOT NULL"""
    )
    con.sql(
        f"""CREATE TEMP TABLE gj_bipc AS
            SELECT b.c, b.s FROM gj_bip b
            JOIN (SELECT c FROM gj_bip GROUP BY c
                  HAVING count(*) <= {JACCARD_HUB_CAP}) cd ON b.c = cd.c"""
    )
    con.sql(
        """CREATE TEMP TABLE gj_deg AS
           SELECT s, CAST(count(*) AS BIGINT) AS d FROM gj_bipc GROUP BY s"""
    )
    cand = sorted({r[0] for r in rows} | {r[1] for r in rows})
    ids = ",".join(str(int(s)) for s in cand)
    con.sql(
        f"CREATE TEMP TABLE gj_sub AS "
        f"SELECT c, s FROM gj_bipc WHERE s IN ({ids})"
    )
    pair_rows = con.sql(
        """SELECT a.s, b.s, CAST(count(*) AS BIGINT)
           FROM gj_sub a JOIN gj_sub b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2"""
    ).fetchall()
    shared = {(x, y): sh for x, y, sh in pair_rows}
    deg = dict(con.sql("SELECT s, d FROM gj_deg WHERE s IN (%s)" % ids).fetchall())
    values_ok = all(
        shared.get((x, y)) == sh
        and round(float(sh) / float(deg[x] + deg[y] - sh), 9) == round(j, 9)
        for x, y, sh, j in rows
    )
    rec["invariants"]["candidate_values_exact"] = values_ok

    try:
        rec["phase"] = "oracle-stepwise"
        con.sql("SET max_temp_directory_size='60GB'")
        con.sql(
            """CREATE TEMP TABLE gj_w AS
               SELECT a.s AS x, b.s AS y, CAST(count(*) AS BIGINT) AS shared
               FROM gj_bipc a JOIN gj_bipc b ON a.c = b.c AND a.s < b.s
               GROUP BY 1, 2"""
        )
        rec["phase"] = "oracle-fetch"
        rel = con.sql(
            f"""SELECT w.x, w.y, w.shared,
                       CAST(w.shared AS DOUBLE)
                           / CAST(dx.d + dy.d - w.shared AS DOUBLE) AS jaccard
                FROM gj_w w JOIN gj_deg dx ON dx.s = w.x
                JOIN gj_deg dy ON dy.s = w.y
                ORDER BY jaccard DESC, w.x, w.y LIMIT {JACCARD_TOPK}"""
        )
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
        match = value_hash(rows, list(df.columns)) == value_hash(
            duck_rows, duck_cols
        )
        rec["mode"] = "oracle-stepwise"
        rec["ok"] = bool(match and values_ok and shape_ok)
        if not rec["ok"]:
            rec["issue"] = (
                f"stepwise mismatch={not match}; invariants={rec['invariants']}"
            )
        else:
            rec["note"] = (
                "full pair aggregation materialized stepwise under an "
                "elevated spill quota — complete top-k hash match at 100x"
            )
        return rec
    except Exception as exc:
        # capacity OR interrupt: adjudicate on the exact candidate
        # values + shape; the completeness attempt's fate is recorded
        rec["mode"] = "heavy-intermediate"
        rec["ok"] = bool(values_ok and shape_ok)
        rec["note"] = (
            "pair-aggregation oracle intermediate (~deg^2/2 per customer, "
            "~675M rows at 100x) exceeded the capacity rails "
            f"({type(exc).__name__}: {str(exc)[:120]}); adjudicated on "
            "EXACT re-scoring of every claimed top-k pair (shared/deg/"
            "jaccard bit-match on the hub-capped projection) + shape "
            "invariants; full top-k parity holds at sf<=0.1 on 7 "
            "distributions + the 10x sweep"
        )
        if not rec["ok"]:
            rec["issue"] = f"invariant failed: {rec['invariants']}"
        return rec


def _verify_lsh_clusters(
    spark, df, rec: dict, state: dict, bands_create: str, key_cols: list
) -> dict:
    """Shared verifier for the LSH cluster family at 100x: the ENGINE
    output is O(docs) by design (the operators' whole point — VERDICT
    r15 #6), but the registered oracles' recursive transitive-closure
    CTEs materialize node x reachable-set pairs, quadratic per
    component, and OOM on the clone replica's giant components. Same
    fixpoint, computed STEPWISE: min-label propagation through the
    band buckets (each pass, every bucket's minimum label floods to
    its members — one temp table per pass, linear work, monotone
    decreasing, fixpoint = component minimum = exactly what the
    engine's union-find labels). Full 500k-row hash compare."""
    rec["phase"] = "spark-collect"
    spark_rows = [tuple(r) for r in df.collect()]
    n_docs = len(spark_rows)
    reps = {}
    for r in spark_rows:
        reps.setdefault(r[1], r[2])
    shape_ok = (
        len({r[0] for r in spark_rows}) == n_docs
        and sum(reps.values()) == n_docs
        and all(
            (r[1] is None) or (r[0] is None) or r[1] <= r[0]
            for r in spark_rows
        )
    )
    rec["invariants"] = {
        "one_row_per_doc": True,
        "sizes_partition_docs": sum(reps.values()) == n_docs,
        "rep_is_min": shape_ok,
    }

    try:
        con = state["con"] = gate_con(DST)
        rec["phase"] = "oracle-bands"
        con.sql(bands_create)
        keys = ", ".join(f"b.{c}" for c in key_cols)
        on = " AND ".join(f"m.{c} = b.{c}" for c in key_cols)
        con.sql(
            "CREATE TEMP TABLE shc_lab AS "
            "SELECT DISTINCT doc_id, doc_id AS lab FROM shc_bands"
        )
        passes = 0
        while passes < 64:
            rec["phase"] = f"oracle-propagate-{passes}"
            con.sql(
                "CREATE TEMP TABLE shc_bmin AS "
                f"SELECT {keys}, MIN(l.lab) AS blab "
                "FROM shc_bands b JOIN shc_lab l USING (doc_id) "
                f"GROUP BY {keys}"
            )
            con.sql(
                "CREATE TEMP TABLE shc_next AS "
                "SELECT l.doc_id, least(l.lab, MIN(m.blab)) AS lab "
                "FROM shc_lab l "
                "JOIN shc_bands b ON b.doc_id = l.doc_id "
                f"JOIN shc_bmin m ON {on} "
                "GROUP BY l.doc_id, l.lab"
            )
            changed = con.sql(
                "SELECT count(*) FROM shc_next n "
                "JOIN shc_lab l USING (doc_id) WHERE n.lab != l.lab"
            ).fetchone()[0]
            con.sql("DROP TABLE shc_lab")
            con.sql("DROP TABLE shc_bmin")
            con.sql("ALTER TABLE shc_next RENAME TO shc_lab")
            passes += 1
            if changed == 0:
                break
        rec["invariants"]["propagation_passes"] = passes
        if changed != 0:
            rec["mode"] = "oracle-stepwise"
            rec["ok"] = False
            rec["issue"] = f"label propagation not converged in {passes}"
            return rec
        rec["phase"] = "oracle-fetch"
        rel = con.sql(
            """
            WITH fin AS (
                SELECT d.doc_id,
                       CAST(coalesce(l.lab, d.doc_id) AS BIGINT)
                           AS cluster_rep
                FROM documents d
                LEFT JOIN shc_lab l ON d.doc_id = l.doc_id
            )
            SELECT doc_id, cluster_rep,
                   CAST(COUNT(*) OVER (PARTITION BY cluster_rep)
                        AS BIGINT) AS cluster_size,
                   doc_id = cluster_rep AS is_rep
            FROM fin
            """
        )
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
        match = value_hash(spark_rows, list(df.columns)) == value_hash(
            duck_rows, duck_cols
        )
        rec["mode"] = "oracle-stepwise"
        rec["ok"] = bool(match and shape_ok)
        if not match:
            rec["issue"] = "stepwise CC oracle value-hash mismatch"
        elif not shape_ok:
            rec["issue"] = f"invariant failed: {rec['invariants']}"
        else:
            rec["note"] = (
                "min-label propagation through band buckets to fixpoint "
                f"({passes} passes) — full O(docs) output hash match at "
                "100x, where the registered transitive-closure oracle "
                "is quadratic per component"
            )
        return rec
    except Exception as exc:
        if not _capacity_error(exc):
            raise
        rec["mode"] = "heavy-intermediate"
        rec["ok"] = bool(shape_ok)
        rec["note"] = (
            "stepwise CC oracle hit the capacity rail "
            f"({type(exc).__name__}); adjudicated on engine-side shape "
            "invariants (one row per doc, sizes partition the corpus, "
            "rep = component min); full hash parity holds at sf<=0.1 on "
            "7 distributions"
        )
        if not rec["ok"]:
            rec["issue"] = f"invariant failed: {rec['invariants']}"
        return rec


def _verify_simhash_clusters(spark, df, rec: dict, state: dict) -> dict:
    from databricks_feature_store_poc_spark.llm.dedup import (
        _SIMHASH_BANDS_CTE,
    )

    return _verify_lsh_clusters(
        spark, df, rec, state,
        f"CREATE TEMP TABLE shc_bands AS WITH {_SIMHASH_BANDS_CTE} "
        "SELECT doc_id, band, key FROM bands",
        ["band", "key"],
    )


def _verify_minhash_clusters(spark, df, rec: dict, state: dict) -> dict:
    from databricks_feature_store_poc_spark.llm.dedup import (
        _DUCK_SHINGLES,
        _MINHASH_BANDS,
        _MINHASH_LANES,
        _mh_sigs_duck,
    )

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + ", ".join(f"mh{b * 4 + r} AS k{r}" for r in range(4))
        + " FROM sigs"
        for b in range(_MINHASH_BANDS)
    )
    return _verify_lsh_clusters(
        spark, df, rec, state,
        # _DUCK_SHINGLES begins "WITH words AS (...)"
        "CREATE TEMP TABLE shc_bands AS "
        + _DUCK_SHINGLES
        + _mh_sigs_duck(_MINHASH_LANES)
        + f", bands AS ({bands_union}) "
        "SELECT doc_id, band, k0, k1, k2, k3 FROM bands",
        ["band", "k0", "k1", "k2", "k3"],
    )


def _verify_image_dhash_clusters(spark, df, rec: dict, state: dict) -> dict:
    """dedup_image_dhash joins the LSH cluster family (r17): same
    star/CC contract over the dHash 4x16 Hamming bands, same
    quadratic-per-component registered transitive-closure oracle at
    100x, same stepwise min-label fixpoint here."""
    from databricks_feature_store_poc_spark.llm.multimodal import (
        _DHASH_PACKED_CTE,
    )

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {expr} AS key"
        " FROM packed WHERE NOT is_null"
        for b, expr in enumerate(
            ["h_lo & 65535", "(h_lo >> 16) & 65535",
             "h_hi & 65535", "(h_hi >> 16) & 65535"]
        )
    )
    return _verify_lsh_clusters(
        spark, df, rec, state,
        f"CREATE TEMP TABLE shc_bands AS WITH {_DHASH_PACKED_CTE}, "
        f"bands AS ({bands_union}) SELECT doc_id, band, key FROM bands",
        ["band", "key"],
    )


def _verify_pack_sequences(spark, df, rec: dict, state: dict) -> dict:
    """pack_sequences at 100x: the registered recursive-CTE FFD oracle
    replays the greedy fold one document per recursion level — exact
    and fine at driver SF (500-5000 docs), but at 500k docs the
    recursion's list-rebuild cost times the gate out. Dedicated
    verifier: DuckDB computes the INPUTS the fold is a pure function of
    (per-shard (n_tokens DESC, doc_id ASC NULLS LAST) sequences — the
    md5 shard hash and tokenization stay cross-engine-checked), and the
    fold itself is replayed driver-side with a DIFFERENT first-fit
    search structure (leftmost-bin-with-capacity segment tree, O(log
    bins) per doc, vs the engine kernel's linear scan) — an independent
    implementation of the same spec, then a full-output hash compare."""
    rec["phase"] = "spark-collect"
    spark_rows = [tuple(r) for r in df.collect()]
    n_docs = len(spark_rows)
    rec["invariants"] = {"n_rows": n_docs}

    try:
        con = state["con"] = gate_con(DST)
        rec["phase"] = "oracle-seq"
        md5_32 = (
            "CAST(list_sum([(strpos('0123456789abcdef', "
            "substring(md5(CAST(doc_id AS VARCHAR)), c, 1)) - 1) "
            "* (16 ** (8 - c)) FOR c IN range(1, 9)]) AS BIGINT)"
        )
        seq = con.sql(
            rf"""
            SELECT doc_id,
                   CAST(coalesce(len(list_filter(
                       string_split_regex(text, '\s+'), x -> x != '')), 0)
                       AS BIGINT) AS n_tokens,
                   CASE WHEN doc_id IS NULL THEN CAST(-1 AS BIGINT)
                        ELSE {md5_32} % 32 END AS shard
            FROM documents
            ORDER BY shard, n_tokens DESC, doc_id ASC NULLS LAST
            """
        ).fetchall()
        rec["phase"] = "replay-ffd"
        CONTEXT = 256
        duck_rows = []
        i = 0
        while i < len(seq):
            shard = seq[i][2]
            j = i
            while j < len(seq) and seq[j][2] == shard:
                j += 1
            # leftmost-fit segment tree over bin capacities
            NEG = -(1 << 60)
            size = 1
            caps: list = []
            tree = [NEG, NEG]  # max-capacity tree, 1-indexed

            def _pull_up(node: int) -> None:
                node //= 2
                while node:
                    tree[node] = max(tree[2 * node], tree[2 * node + 1])
                    node //= 2

            for doc_id, nt, _ in seq[i:j]:
                nt = int(nt)
                if caps and tree[1] >= nt:
                    node = 1
                    while node < size:  # descend to leftmost fitting bin
                        node *= 2
                        if tree[node] < nt:
                            node += 1
                    b = node - size
                    caps[b] -= nt
                    tree[node] = caps[b]
                    _pull_up(node)
                else:
                    b = len(caps)
                    caps.append(CONTEXT - nt)
                    if len(caps) > size:  # grow + rebuild
                        while size < len(caps):
                            size *= 2
                        tree = [NEG] * (2 * size)
                        for k, c in enumerate(caps):
                            tree[size + k] = c
                        for k in range(size - 1, 0, -1):
                            tree[k] = max(tree[2 * k], tree[2 * k + 1])
                    else:
                        tree[size + b] = caps[b]
                        _pull_up(size + b)
                duck_rows.append((doc_id, shard, nt, b))
            i = j
        rec["mode"] = "spec-replay"
        match = value_hash(spark_rows, list(df.columns)) == value_hash(
            duck_rows, ["doc_id", "shard", "n_tokens", "bin_id"]
        )
        rec["ok"] = bool(match and len(duck_rows) == n_docs)
        if not match:
            rec["issue"] = "FFD spec-replay value-hash mismatch"
        else:
            rec["note"] = (
                "inputs (md5 shard + token counts + pack order) "
                "cross-engine from DuckDB; greedy fold replayed with an "
                "independent leftmost-fit segment tree — full output "
                "hash match at 100x (the registered recursive-CTE "
                "oracle is exact but times out at 500k docs)"
            )
        return rec
    except Exception as exc:
        if not _capacity_error(exc):
            raise
        rec["mode"] = "heavy-intermediate"
        rec["ok"] = False
        rec["issue"] = f"capacity: {type(exc).__name__}"
        return rec


HEAVY_INTERMEDIATE = {
    "graph_pagerank": _verify_pagerank,
    "dedup_semantic_cluster": _verify_semantic_cluster,
    "graph_jaccard_neighbors": _verify_jaccard,
    "dedup_simhash_clusters": _verify_simhash_clusters,
    "dedup_minhash_clusters": _verify_minhash_clusters,
    "dedup_image_dhash": _verify_image_dhash_clusters,
    "pack_sequences": _verify_pack_sequences,
}

# Per-query wall multipliers (applied to GATE_TIMEOUT) for queries whose
# ORACLE side is structurally slow at 100x even though the Spark side is
# fine — a default 600 s sweep would otherwise record a spurious red.
# graph_bfs_reach: DuckDB's 3-hop MATERIALIZED-CTE unroll took 503 s at
# 100x under GATE_TIMEOUT=1800 in r14 (commit a572da7); the Spark side
# is seconds after the r15 localCheckpoint fix.
TIMEOUT_MULTIPLIER = {
    "graph_bfs_reach": 3.0,
    # color JPEG decode at 500k docs is payload volume (map-only plan):
    # ~18 blocks/doc through a python entropy decoder; the DC-only
    # IDCT fast path cut it ~10x but the margin keeps a slow machine
    # from recording a spurious red
    "mm_decode_jpeg_color": 2.0,
    # the apply oracle re-runs the ENTIRE unrolled 6-round learn
    # pipeline (347 s standalone at 100x) before its own join — a
    # structurally slow oracle, not an engine cost
    "text_bpe_apply": 3.0,
    # same structurally slow unrolled-learn oracle as text_bpe_apply,
    # plus the lookup join replay
    "training_set_bpe_features": 3.0,
    # three unrolled batched rounds (pair counts + window + recursive
    # applies) over the 500k-doc vocabulary — oracle volume, engine is
    # seconds
    "text_bpe_learn_batched": 3.0,
}


def _sample_cols(dtypes: list[tuple]) -> list[str]:
    return [c for c, t in dtypes if t in SAMPLE_TYPES]


def run_one(spark, name: str) -> dict:
    fn = QUERIES[name]
    rec: dict = {"query": name, "phase": "spark-build"}
    t0 = time.perf_counter()
    fired = threading.Event()
    sc = spark.sparkContext
    group = f"gate100x-{name}"
    sc.setJobGroup(group, name, interruptOnCancel=True)
    state: dict = {"con": None}

    def cancel():
        fired.set()
        try:
            sc.cancelJobGroup(group)
        except Exception:
            pass
        if state["con"] is not None:
            try:
                state["con"].interrupt()
            except Exception:
                pass

    # heavy-intermediate verifiers run extra full-corpus passes
    # (mass-conservation pagerank, stepwise iterations) — 3x budget;
    # TIMEOUT_MULTIPLIER covers structurally-slow oracles (see map).
    wall = TIMEOUT * (
        3 if name in HEAVY_INTERMEDIATE else TIMEOUT_MULTIPLIER.get(name, 1)
    )
    timer = threading.Timer(wall, cancel)
    timer.daemon = True
    timer.start()
    try:
        df = fn(spark, DST)
        rec["phase"] = "spark-count"
        n_spark = df.count()
        rec["spark_rows"] = n_spark
        if name in HEAVY_INTERMEDIATE:
            return HEAVY_INTERMEDIATE[name](spark, df, rec, state)
        if name not in ORACLES:
            rec["mode"] = "rows-only"
            rec["ok"] = n_spark > 0
            if n_spark == 0 and name in CLONE_DEGENERATE_ZERO:
                rec["ok"] = True
                rec["note"] = (
                    "0 rows is the DF cap working at 100x clones (every "
                    "shingle df > DF_CAP) — same adjudication as the "
                    "stress sweep's CLONE_DEGENERATE_ZERO"
                )
            return rec
        con = state["con"] = gate_con(DST)
        rec["phase"] = "oracle-count"
        n_duck = con.sql(
            f"SELECT COUNT(*) FROM ({ORACLES[name]})"
        ).fetchone()[0]
        rec["oracle_rows"] = n_duck
        if n_spark != n_duck:
            rec["mode"] = "count"
            rec["ok"] = False
            rec["issue"] = f"rowcount spark={n_spark} duck={n_duck}"
            return rec
        if n_spark > CAP_ROWS:
            return _count_sample(df, con, name, rec)
        rec["phase"] = "spark-collect"
        spark_rows = [tuple(r) for r in df.collect()]
        rec["phase"] = "oracle-fetch"
        rel = con.sql(ORACLES[name])
        duck_cols = list(rel.columns)
        duck_rows = rel.fetchall()
        issues = []
        if sorted(df.columns) != sorted(duck_cols):
            issues.append(
                f"cols spark={sorted(df.columns)} duck={sorted(duck_cols)}"
            )
        elif value_hash(spark_rows, df.columns) != value_hash(
            duck_rows, duck_cols
        ):
            issues.append("value-hash mismatch")
        rec["mode"] = "oracle"
        rec["ok"] = not issues
        if issues:
            rec["issue"] = "; ".join(issues)
        return rec
    except Exception as exc:
        rec["sec"] = round(time.perf_counter() - t0, 2)
        if _capacity_error(exc) and name in QUADRATIC_OUTPUT:
            rec["ok"] = True
            rec["oom_explained"] = (
                "oracle capacity rail hit (memory cap or spill quota — "
                f"{type(exc).__name__} in phase {rec.get('phase')}): "
                "deliberately quadratic OUTPUT/work at 100x clones "
                "(~4950x the 10x pair volume) — same adjudication as a "
                "quadratic timeout; the 10x sweep row is the plan-shape "
                "evidence"
            )
            return rec
        if fired.is_set():
            rec["timeout"] = True
            rec["ok"] = name in QUADRATIC_OUTPUT
            if name in QUADRATIC_OUTPUT:
                rec["timeout_explained"] = (
                    "deliberately quadratic OUTPUT at 100x clones (every "
                    "cross-clone duplicate is a TRUE pair, ~4950x the 10x "
                    "pair volume) — same adjudication as the stress sweep"
                )
            else:
                rec["ok"] = False
                rec["issue"] = (
                    f"timeout after {wall:.0f}s in phase {rec.get('phase')}"
                )
        else:
            rec["ok"] = False
            rec["issue"] = (
                f"{type(exc).__name__} in phase {rec.get('phase')}: {exc}"
            )[:300]
        return rec
    finally:
        timer.cancel()
        sc.setJobGroup("", "")
        if state["con"] is not None:
            try:
                state["con"].close()
            except Exception:
                pass
        rec.setdefault("sec", round(time.perf_counter() - t0, 2))


def _count_sample(df, con, name: str, rec: dict) -> dict:
    """count+sample mode (VERDICT r13 #6): counts already matched and
    exceed CAP_ROWS; additionally hash-compare the deterministic
    md5-prefix ~0.1% sample on a cross-engine-stable key column so
    at-scale VALUE corruption is caught, not just cardinality."""
    from pyspark.sql import functions as F

    n_spark = rec["spark_rows"]
    base_note = (
        f"output {n_spark} rows > cap {CAP_ROWS}: per-row map "
        "semantics hash-gated at sf<=0.1 on 7 distributions"
    )
    # a low-cardinality key (< ~4096 distinct values) can hash every
    # distinct value outside the md5 prefix window -> 0 sampled rows, a
    # vacuous check (observed on join_asof) — walk the eligible columns
    # until one yields a non-empty, under-cap sample
    col, sdf, n_s, tried = None, None, None, []
    for c in _sample_cols(df.dtypes):
        rec["phase"] = f"sample-spark-count-{c}"
        pred = (
            F.substring(F.md5(F.col(c).cast("string")), 1, 3)
            <= SAMPLE_PREFIX
        )
        cand = df.filter(pred)
        n = cand.count()
        tried.append(f"{c}:{n}")
        if 0 < n <= SAMPLE_CAP:
            col, sdf, n_s = c, cand, n
            break
    if col is None:
        rec["mode"] = "count-only"
        rec["ok"] = True
        rec["note"] = base_note + (
            "; no cross-engine-stable column yields a usable md5 sample "
            f"(tried {tried or 'none'}) — count compare is the at-scale "
            "fan-out check"
        )
        return rec
    rec["phase"] = "sample-oracle-fetch"
    rel = con.sql(
        f"SELECT * FROM ({ORACLES[name]}) __gq "
        f'WHERE substr(md5(CAST("{col}" AS VARCHAR)), 1, 3) '
        f"<= '{SAMPLE_PREFIX}'"
    )
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    rec["phase"] = "sample-spark-collect"
    spark_rows = [tuple(r) for r in sdf.collect()]
    rec["mode"] = "count+sample"
    rec["sample_col"] = col
    rec["sample_rows"] = n_s
    issues = []
    if len(duck_rows) != len(spark_rows):
        issues.append(
            f"sample rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
        )
    elif sorted(df.columns) != sorted(duck_cols):
        issues.append(
            f"cols spark={sorted(df.columns)} duck={sorted(duck_cols)}"
        )
    elif value_hash(spark_rows, df.columns) != value_hash(
        duck_rows, duck_cols
    ):
        issues.append(f"sample value-hash mismatch ({n_s} rows on {col})")
    rec["ok"] = not issues
    if issues:
        rec["issue"] = "; ".join(issues)
    else:
        rec["note"] = (
            f"count match at {n_spark} rows + value-hash match on the "
            f"deterministic md5(0.1%) sample ({n_s} rows keyed on {col})"
        )
    return rec


def _latest_records(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                if ln.strip():
                    r = json.loads(ln)
                    out[r["query"]] = r
    return out


def main() -> int:
    from databricks_feature_store_poc_spark.session import get_spark

    only = [s for s in os.environ.get("GATE_ONLY", "").split(",") if s]
    resume = bool(os.environ.get("GATE_RESUME"))

    # ADVICE r13: never truncate the multi-hour sweep record for a
    # targeted re-check — GATE_ONLY without GATE_RESUME goes to a side
    # file; truncation happens only for a fresh unrestricted sweep.
    results_path = RESULTS
    if only and not resume:
        results_path = RESULTS_ONLY
        open(results_path, "w").close()
    elif resume:
        pass  # append to the standing record
    else:
        open(results_path, "w").close()

    # ADVICE r13: resume skips only queries whose LATEST record is
    # ok=true, so standing reds re-run instead of being masked.
    done: set[str] = set()
    if resume:
        done = {
            n for n, r in _latest_records(results_path).items() if r.get("ok")
        }
        # GATE_FORCE + GATE_ONLY: re-run the named queries even if their
        # latest record is green (e.g. to upgrade a vacuous count-only /
        # empty-sample row after a gate improvement); latest-wins in the
        # summary
        if only and os.environ.get("GATE_FORCE"):
            done -= set(only)

    spark = get_spark("gate-100x")
    load_all_queries()
    names = only or sorted(QUERIES)
    for i, name in enumerate(names):
        if name in done:
            continue
        rec = run_one(spark, name)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        status = "OK" if rec["ok"] else "FAIL"
        print(
            f"[{i + 1}/{len(names)}] {name}: {status} "
            f"{rec.get('mode', '')} {rec.get('sec', '')}s "
            f"{rec.get('issue', '')}",
            flush=True,
        )

    # summary + exit code from the results FILE (latest record per
    # name), so a resumed run surfaces standing reds (ADVICE r13)
    latest = _latest_records(results_path)
    failed = sorted(n for n, r in latest.items() if not r.get("ok"))
    summary = {
        "sf_dir": DST,
        "n": len(latest),
        "failed": failed,
        "modes": {},
    }
    for r in latest.values():
        m = r.get("mode", "timeout" if r.get("timeout") else "?")
        summary["modes"][m] = summary["modes"].get(m, 0) + 1
    if results_path == RESULTS:
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
