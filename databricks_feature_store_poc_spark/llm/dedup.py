"""Document deduplication operators (north-star LLM pipeline, SURVEY §2/M5).

Four dedup families over ``documents`` + one over ``embeddings``:

- ``dedup_exact``        — content-hash grouping (oracle-checked).
- ``dedup_ngram_jaccard``— EXACT near-dup pairs by 5-word-shingle Jaccard,
  found via an inverted-index join (oracle-checked). This is the
  scale-correct exact algorithm: a pair can have Jaccard > 0 only if it
  shares a shingle, so joining on shingles loses nothing, and the join
  fan-out is bounded by capping shingle document-frequency (stop-shingle
  removal, applied identically in the oracle).
- ``dedup_near_minhash`` — MinHash-LSH candidates, then exact-Jaccard
  verification. FULL oracle since r15 (md5-derived lane hashes reproduce
  the whole pipeline in DuckDB); every emitted pair is exact-verified, so
  output ⊆ dedup_ngram_jaccard output — the containment invariant
  tests/test_llm.py pins.
- ``dedup_simhash``      — 64-bit SimHash fingerprints + banded Hamming
  pairs (FULL oracle since r15: md5-derived word hashes make the
  fingerprints themselves SQL-recomputable).
- ``dedup_embedding_cosine`` — near-dup by embedding cosine (oracle via
  DuckDB list ops on DOUBLE[]).

At 100 TB none of these ever materializes an all-pairs product: exact and
minhash pair generation go through bucket joins (shingle / LSH-band keys),
and the embedding variant guards its quadratic path behind a row-count cap
with the LSH route above it (llm/similarity.py).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.cacheutil import app_id as _app_id
from databricks_feature_store_poc_spark.cacheutil import (
    tracked_local_checkpoint as _ckpt,
)
from databricks_feature_store_poc_spark.registry import query
from databricks_feature_store_poc_spark.sources.catalog import load_table

# Stop-shingle cap: shingles appearing in more documents than this are
# dropped from BOTH the signature and the pair search (on both engines).
# Bounds inverted-index join fan-out to DF_CAP^2 pairs per shingle.
DF_CAP = 50
SHINGLE_WORDS = 5
JACCARD_THRESHOLD = 0.3

# Shared Spark-side shingle pipeline --------------------------------------

_WORDS = r"filter(split(text, '\\s+'), x -> x != '')"


def shingle_expr(width: int, words_col: str = "words") -> str:
    """Spark SQL for the distinct `width`-word shingle array of a
    tokenized column. The size guard matters: sequence(1, n) with n < 1
    produces a DESCENDING sequence reaching 0, and slice(..., 0, w)
    throws — so documents shorter than `width` words must short-circuit
    to an empty array, exactly like the oracle's range() (empty when the
    upper bound < lower). Shared by every shingle consumer (dedup,
    decontamination, curation pipeline) so the guard lives in ONE place."""
    return (
        f"if(size({words_col}) >= {width}, "
        f"array_distinct(transform("
        f"sequence(1, size({words_col}) - {width - 1}), "
        f"i -> concat_ws(' ', slice({words_col}, i, {width})))), "
        f"array())"
    )

# Same pipeline in DuckDB SQL (list slicing is 1-based inclusive, so
# w[i : i + SHINGLE_WORDS - 1] is a SHINGLE_WORDS-long slice).
_DUCK_SHINGLES = rf"""
    WITH words AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS w
        FROM documents
    ),
    shingled AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i : i + {SHINGLE_WORDS - 1}], ' ')
                              FOR i IN range(1, greatest(len(w) - {SHINGLE_WORDS - 2}, 1))])
                   AS shingles
        FROM words
    ),
    exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle FROM shingled
    ),
    kept AS (
        SELECT doc_id, shingle
        FROM exploded
        QUALIFY COUNT(DISTINCT doc_id) OVER (PARTITION BY shingle) <= {DF_CAP}
    ),
    doc_sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM kept GROUP BY doc_id
    )
"""


# Session-scoped memo for the inverted index: five dedup queries build
# the identical (tokenize -> shingle -> DF-cap) pipeline over the same
# corpus; reusing one persisted index across them is the same reuse-a-
# partitioning principle as sharing a shuffle across window frames.
# Keyed by Spark application id so a new session never sees another
# session's (invalid) cached plan.
_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}
# A long-lived session touching many sf_dirs would otherwise accumulate
# persisted indexes in executor storage memory forever; two live entries
# cover the dev loop (one sf for tests + one for bench) and anything older
# is unpersisted on insert.
_INDEX_CACHE_MAX = 2


def shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) inverted index with stop-shingles removed.

    One explode + one group-filter; no driver materialization. The DF cap
    is computed with a window over the exploded index (count distinct docs
    per shingle) — a single shuffle on shingle. Memoized per
    (session, sf_dir): deterministic content, so reuse is invisible to
    callers except in wall time.
    """
    cache_key = (_app_id(spark), sf_dir)
    cached = _INDEX_CACHE.get(cache_key)
    if cached is not None:
        return cached
    d = load_table(spark, sf_dir, "documents")
    # Materialize the words array once per row; building shingles off the
    # raw split expression would re-tokenize the text per index inside the
    # transform lambda (O(n^2) per document).
    with_words = d.select("doc_id", F.expr(_WORDS).alias("words"))
    ex = with_words.select(
        "doc_id", F.explode(F.expr(shingle_expr(SHINGLE_WORDS))).alias("shingle")
    )
    # (doc_id, shingle) is distinct after array_distinct, so document
    # frequency is a plain COUNT(*) window over shingle — ONE shuffle,
    # where the agg+self-join formulation costs two.
    from pyspark.sql.window import Window

    idx = (
        ex.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= DF_CAP)
        .select("doc_id", "shingle")
    )
    # The callers fan the index into several DAG branches (signatures,
    # pair join both sides, size lookup) — persist so the tokenize +
    # df-cap shuffle runs once, not per branch.
    idx = idx.persist()
    _INDEX_CACHE[cache_key] = idx
    # Evict superseded entries (oldest-first; dicts preserve insertion
    # order). Entries from dead sessions just get dropped — unpersist on a
    # stopped SparkContext raises, and their storage died with the JVM.
    app_id = _app_id(spark)
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        old_key, old_df = next(iter(_INDEX_CACHE.items()))
        del _INDEX_CACHE[old_key]
        if old_key[0] == app_id:
            try:
                old_df.unpersist(blocking=False)
            except Exception:
                pass
    return idx


def _jaccard_for_pairs(idx: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for a GIVEN candidate pair set (doc_a, doc_b).

    Shared-shingle counts come from joining the index to the pair list on
    each side — cost O(candidates x shingles-per-doc), NOT all-pairs.
    This is what makes LSH verification honest at scale: the expensive
    exact computation touches only what the buckets surfaced.
    """
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = idx.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = idx.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _jaccard_pairs_from_index(idx: DataFrame) -> DataFrame:
    """Exact Jaccard pairs from a (doc_id, shingle) index via self-join."""
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = idx.alias("a")
    b = idx.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on sha2(text), keep the lowest doc_id.

    Hash-groupBy is the 100 TB shape: the shuffle carries 32-byte digests
    instead of full documents (the oracle groups by raw text — same
    partition, since sha2 is injective modulo collisions).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_doc_id", "dup_count")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=_DUCK_SHINGLES + f"""
    , shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT s.doc_a, s.doc_b,
           s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared) AS jaccard
    FROM shared s
    JOIN doc_sizes sa ON s.doc_a = sa.doc_id
    JOIN doc_sizes sb ON s.doc_b = sb.doc_id
    WHERE s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
          >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs: Jaccard >= 0.3 on 5-word shingle sets.

    Candidate generation is an inverted-index self-join on shingle — exact
    because jaccard > 0 requires a shared shingle — with stop-shingles
    (df > DF_CAP) removed on both engines. The jaccard value itself is an
    integer ratio, so the double division is bit-identical cross-engine.
    """
    return _jaccard_pairs_from_index(shingle_index(spark, sf_dir))


# Engine-portable 48-bit lane hashes for MinHash via Kirsch-
# Mitzenmacher double hashing (the published standard for deriving k
# hash functions from two — "Less hashing, same performance", ESA
# 2006): ONE md5 per shingle supplies h1 (hex chars 1-12) and h2
# (chars 13-24), and lane_i = (h1 + i*h2) & (2^48-1) is pure integer
# arithmetic — 16x fewer digests than a per-lane md5. md5 is the one
# hash BOTH Spark and DuckDB compute bit-identically, which is what
# promotes the PRIMARY minhash query from rows-only to a full
# value-hash oracle (VERDICT r14 #6): signatures, band buckets,
# candidates and verified pairs all reproduce exactly in SQL.
# h1 + 15*h2 < 2^52, far inside int64. Lane-hash collisions only tie a
# min (same value both engines) — determinism is unaffected.
_MINHASH_LANES = 16
_MINHASH_BANDS = 4
_MH_MASK = (1 << 48) - 1


def _mh_sigs_spark(idx: DataFrame, n_lanes: int) -> DataFrame:
    """Per-doc minhash signature columns mh0..mh{n-1} from a
    (doc_id, shingle) index — one md5 per shingle, lanes by integer
    arithmetic, one groupBy.

    Built from sql-string expressions (r18 floor, VERDICT r17 #1): the
    column-object form cost ~1,500 py4j round-trips per build (16 lanes
    x ~8 ops each, 3-4 builds per bench pass across the minhash family);
    one parsed expression per column is ~50. The parsed SQL is the
    IDENTICAL expression tree (same functions, same casts, same
    precedence), so the analyzed plan and results are unchanged —
    re-verified against the oracle and pinned by the existing
    signature-equivalence tests."""
    hashed = idx.selectExpr(
        "doc_id",
        "CAST(conv(substring(md5(shingle), 1, 12), 16, 10) AS BIGINT)"
        " AS mh_h1",
        "CAST(conv(substring(md5(shingle), 13, 12), 16, 10) AS BIGINT)"
        " AS mh_h2",
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"min((mh_h1 + {i} * mh_h2) & {_MH_MASK}) AS mh{i}")
            for i in range(n_lanes)
        ]
    )


def _mh_half_duck(pos: int) -> str:
    """DuckDB: 48-bit integer from 12 hex chars of md5(shingle) at pos."""
    return (
        "CAST(list_sum([(strpos('0123456789abcdef', "
        f"substring(md5(shingle), {pos} + c - 1, 1)) - 1) "
        "* (16 ** (12 - c)) FOR c IN range(1, 13)]) AS BIGINT)"
    )


def _mh_sigs_duck(n_lanes: int) -> str:
    """DuckDB CTE pair mirroring _mh_sigs_spark (append after kept)."""
    lanes = ", ".join(
        f"min((h1 + {i} * h2) & {_MH_MASK}) AS mh{i}" for i in range(n_lanes)
    )
    return f"""
    , wh AS (
        SELECT doc_id, {_mh_half_duck(1)} AS h1, {_mh_half_duck(13)} AS h2
        FROM kept
    ),
    sigs AS (
        SELECT doc_id, {lanes}
        FROM wh GROUP BY doc_id
    )"""


_MINHASH_ORACLE = _DUCK_SHINGLES + _mh_sigs_duck(_MINHASH_LANES) + f"""
    , bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            + ", ".join(f"mh{b * 4 + r} AS k{r}" for r in range(4))
            + " FROM sigs"
            for b in range(_MINHASH_BANDS)
        )}
    ),
    cands AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared_bands
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
         AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT c.doc_a, c.doc_b, c.n_shared_bands, COUNT(*) AS shared
        FROM cands c
        JOIN kept a ON a.doc_id = c.doc_a
        JOIN kept b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2, 3
    )
    SELECT s.doc_a, s.doc_b,
           s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
               AS jaccard,
           CAST(s.n_shared_bands AS INT) AS n_shared_bands
    FROM shared s
    JOIN doc_sizes sa ON s.doc_a = sa.doc_id
    JOIN doc_sizes sb ON s.doc_b = sb.doc_id
    WHERE s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
          >= {JACCARD_THRESHOLD}
"""


@query("dedup_near_minhash", oracle=_MINHASH_ORACLE)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: 16 minhashes over the shingle set, banded
    4x4; docs sharing a band bucket become candidates; candidates are
    verified with EXACT Jaccard before emission, plus the pair's
    band-collision count (``n_shared_bands``).

    FULL oracle (promoted from rows-only, VERDICT r14 #6): lane hashes
    are md5-derived (see ``_mh_sigs_spark``/``_mh_sigs_duck``), so the
    DuckDB oracle reproduces the ENTIRE pipeline — signatures, band
    buckets, candidate pairs, band counts and verified Jaccard — value-
    for-value; nothing engine-private reaches the output. Band buckets
    join on the raw minhash 4-tuple (not a re-hash of it), so a bucket
    collision cannot manufacture a candidate the oracle lacks.

    The 100 TB contract: pair generation cost is (bucket size)^2 summed
    over buckets — never all-pairs — and verification touches only
    candidates. Because emitted pairs are exact-verified, the output is a
    subset of dedup_ngram_jaccard's (containment pinned in tests); LSH
    with these parameters catches ~all pairs at jaccard >= 0.5 and most at
    0.3 (p = 1-(1-j^4)^4). md5 costs ~10x xxhash64 per lane but stays
    JVM-side and map-only; the shuffles (signature groupBy, band join)
    are unchanged.
    """
    idx = shingle_index(spark, sf_dir)
    sigs = _mh_sigs_spark(idx, _MINHASH_LANES)
    # 4 bands of 4 rows; the JOIN KEY is the band's minhash 4-tuple
    # itself (oracle-reproducible), not a hash of it.
    # expression-string form (r18 floor, VERDICT r17 #1): identical
    # plan to the old column-object construction, ~1/10th the py4j
    # round-trips during build
    band_structs = ", ".join(
        "named_struct('band', {b}, {ks})".format(
            b=b,
            ks=", ".join(f"'k{r}', mh{b * 4 + r}" for r in range(4)),
        )
        for b in range(_MINHASH_BANDS)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).selectExpr("doc_id", "bk.band", "bk.k0", "bk.k1", "bk.k2", "bk.k3")
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            F.expr(
                "a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1"
                " AND a.k2 = b.k2 AND a.k3 = b.k3"
                " AND a.doc_id < b.doc_id"
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.expr("CAST(count(1) AS INT) AS n_shared_bands"))
        # localCheckpoint (r17 optimization): candidates feeds BOTH the
        # exact-Jaccard verification and the final n_shared_bands
        # join-back — without truncation the signature groupBy + band
        # self-join executes twice per run (and dedup_minhash_audit,
        # which calls this query, paid it twice more). The table is the
        # LSH bucket output: O(candidate pairs) by construction, the
        # smallest relation this pipeline holds.
        .transform(_ckpt)
    )
    # Verify ONLY the candidates — computing all exact pairs here would
    # defeat the LSH: verification cost must scale with bucket output.
    verified = _jaccard_for_pairs(idx, candidates.select("doc_a", "doc_b"))
    return verified.join(candidates, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard", "n_shared_bands"
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h_lo, h_hi) 64-bit SimHash fingerprints for the corpus
    (bit b of the fingerprint = sign of the sum of ±1 contributions of
    each distinct word's hash bit b).

    The pipeline: explode(distinct words) -> md5-derived 64-bit hash
    (JVM conv/substring; engine-portable so the dedup_simhash oracle can
    recompute the fingerprints — r15) -> collect_list per doc (one shuffle) -> an Arrow-batched numpy
    kernel that bit-unpacks all hashes of a batch at once and
    segment-sums per document (np.add.reduceat), emitting the packed
    64-bit fingerprint as two longs. Two earlier drafts were slower: a
    higher-order-function lambda folding a 64-wide array per word runs
    interpreted (~50x), and 64 conditional-sum JVM aggregates spend more
    time COMPILING their giant codegen unit than executing it at any
    scale where compile time matters per plan.

    Session-persisted per corpus: dedup_simhash and its audit twin both
    consume the identical fingerprint table.
    """
    import os as _os

    from databricks_feature_store_poc_spark.cacheutil import (
        session_get,
        session_persist,
    )

    sources = [_os.path.join(sf_dir, "documents.parquet")]
    cached = session_get(spark, "simhash_fingerprints", sources)
    if cached is not None:
        return cached

    d = load_table(spark, sf_dir, "documents")
    # 64-bit word hash = first 16 hex chars of md5(word), assembled from
    # two 32-bit conv() halves (conv of 16 chars would overflow the
    # signed-long parse). md5 replaces xxhash64 (r15, VERDICT r14 #6) so
    # the fingerprints — and therefore dedup_simhash's FULL output —
    # reproduce bit-identically in the DuckDB oracle.
    tokens = d.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, '\\\\s+'), x -> x != ''))")
        ).alias("word"),
    ).withColumn(
        "h",
        F.shiftleft(
            F.conv(F.substring(F.md5("word"), 9, 8), 16, 10).cast("long"), 32
        ).bitwiseOR(
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
        ),
    )
    hashes = tokens.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))

    @F.pandas_udf("struct<lo: long, hi: long>")
    def fingerprint(hs: pd.Series) -> pd.DataFrame:
        import numpy as np

        if len(hs) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        # collect_list groups are never empty, so offsets are strictly
        # increasing and reduceat segments are well-formed.
        counts = np.array([len(x) for x in hs], dtype=np.int64)
        allh = np.concatenate([np.asarray(x, dtype=np.int64) for x in hs]).view(np.uint64)
        bits = ((allh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        offsets = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        set_counts = np.add.reduceat(bits, offsets, axis=0)
        # sign-sum lane b is 2*set_b - n; fingerprint bit b set iff > 0
        sign_pos = (2 * set_counts) > counts[:, None]
        weights = 1 << np.arange(64, dtype=np.uint64)
        packed = sign_pos.astype(np.uint64) * weights[None, :]
        lo = packed[:, :32].sum(axis=1).astype(np.int64)
        hi = (packed[:, 32:].sum(axis=1) >> np.uint64(32)).astype(np.int64)
        return pd.DataFrame({"lo": lo, "hi": hi})

    docs = hashes.select("doc_id", fingerprint("hs").alias("f")).select(
        "doc_id", F.col("f.lo").alias("h_lo"), F.col("f.hi").alias("h_hi")
    )
    return session_persist(spark, "simhash_fingerprints", sources, docs)


def _sim_word_half_duck(pos: int) -> str:
    """DuckDB: 32-bit integer from 8 hex chars of md5(word) at pos."""
    return (
        "CAST(list_sum([(strpos('0123456789abcdef', "
        f"substring(md5(word), {pos} + c - 1, 1)) - 1) * (16 ** (8 - c)) "
        "FOR c IN range(1, 9)]) AS BIGINT)"
    )


# words -> md5 hashes -> majority fingerprints -> 4x16 band keys;
# shared prefix of the dedup_simhash (pair) and dedup_simhash_clusters
# (component) oracles.
_SIMHASH_BANDS_CTE = rf"""
    words AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                   string_split_regex(text, '\s+'), x -> x != ''))) AS word
        FROM documents
    ),
    wh AS (
        SELECT doc_id,
               {_sim_word_half_duck(1)} AS lo,
               {_sim_word_half_duck(9)} AS hi
        FROM words
    ),
    fp AS (
        SELECT doc_id, COUNT(*) AS nw,
               {", ".join(f"SUM((lo >> {b}) & 1) AS s{b}" for b in range(32))},
               {", ".join(f"SUM((hi >> {b}) & 1) AS t{b}" for b in range(32))}
        FROM wh GROUP BY doc_id
    ),
    packed AS (
        SELECT doc_id,
               CAST({" + ".join(
                   f"(CASE WHEN 2 * s{b} > nw THEN {1 << b} ELSE 0 END)"
                   for b in range(32)
               )} AS BIGINT) AS h_lo,
               CAST({" + ".join(
                   f"(CASE WHEN 2 * t{b} > nw THEN {1 << b} ELSE 0 END)"
                   for b in range(32)
               )} AS BIGINT) AS h_hi
        FROM fp
    ),
    bands AS (
        SELECT doc_id, h_lo, h_hi, 0 AS band, h_lo & 65535 AS key FROM packed
        UNION ALL
        SELECT doc_id, h_lo, h_hi, 1, (h_lo >> 16) & 65535 FROM packed
        UNION ALL
        SELECT doc_id, h_lo, h_hi, 2, h_hi & 65535 FROM packed
        UNION ALL
        SELECT doc_id, h_lo, h_hi, 3, (h_hi >> 16) & 65535 FROM packed
    )
"""

_SIMHASH_ORACLE = f"""
    WITH {_SIMHASH_BANDS_CTE},
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.h_lo AS a_lo, a.h_hi AS a_hi,
               b.h_lo AS b_lo, b.h_hi AS b_hi
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(a_lo, b_lo))
                + bit_count(xor(a_hi, b_hi)) AS INT) AS hamming
    FROM cands
    WHERE bit_count(xor(a_lo, b_lo)) + bit_count(xor(a_hi, b_hi)) <= 8
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup over ``simhash_fingerprints``, banded
    Hamming search: 4 bands of 16 bits; a pair sharing any exact band
    becomes a candidate (guarantees recall for Hamming distance <= 3 by
    pigeonhole, since 4 bands can't all differ); candidates within
    Hamming <= 8 are emitted. Pair search is a bucket join on 16-bit
    band values, never all-pairs.

    FULL oracle (promoted from rows-only, VERDICT r14 #6): word hashes
    are md5-derived, so the DuckDB oracle recomputes the fingerprints
    themselves — per-word 32-bit halves from hex, 64 per-bit majority
    sums per document, the packed 64-bit fingerprint, the 4x16 band
    buckets and the Hamming radius — and the emitted pair set matches
    value-for-value. The oracle mirrors SEMANTICS, not the plan: it
    takes DISTINCT over all shared-band matches where the engine keeps
    only the lowest shared band (a map-side bit-ops filter that avoids
    the distinct shuffle) — same set either way. The audit twin
    (``dedup_simhash_audit``) still checks the statistical contract.
    """
    docs = simhash_fingerprints(spark, sf_dir)
    band_keys = [
        F.col("h_lo").bitwiseAND(65535),
        F.shiftright("h_lo", 16).bitwiseAND(65535),
        F.col("h_hi").bitwiseAND(65535),
        F.shiftright("h_hi", 16).bitwiseAND(65535),
    ]
    bands = docs.select(
        "doc_id", "h_lo", "h_hi",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), band_keys[i].alias("key"))
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", "h_lo", "h_hi",
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    # First-shared-band dedup: a pair sharing k bands appears in k join
    # groups; instead of a distinct() shuffle over millions of candidate
    # rows, keep a match only in its LOWEST shared band — for band i,
    # require every band j < i to differ. All band keys are recomputable
    # from the packed fingerprints, so this is a map-side bit-ops filter
    # and the join output needs no dedup pass at all.
    def _key(col: str, j: int) -> F.Column:
        word = F.col(f"{col}_lo") if j < 2 else F.col(f"{col}_hi")
        return F.shiftright(word, 16 * (j % 2)).bitwiseAND(65535)

    first_band = F.lit(True)
    for j in range(3):
        first_band = first_band & (
            (F.col("band") <= j) | (_key("a", j) != _key("b", j))
        )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.band").alias("band"),
            F.col("a.h_lo").alias("a_lo"), F.col("a.h_hi").alias("a_hi"),
            F.col("b.h_lo").alias("b_lo"), F.col("b.h_hi").alias("b_hi"),
        )
        .filter(first_band)
        .withColumn(
            "hamming",
            F.expr("bit_count(a_lo ^ b_lo) + bit_count(a_hi ^ b_hi)").cast("int"),
        )
        .filter(F.col("hamming") <= 8)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "dedup_simhash_clusters",
    oracle=f"""
    WITH RECURSIVE {_SIMHASH_BANDS_CTE},
    roots AS (
        SELECT band, key, MIN(doc_id) AS root
        FROM bands GROUP BY band, key
    ),
    star AS (
        SELECT DISTINCT r.root AS sa, b.doc_id AS sb
        FROM bands b JOIN roots r ON b.band = r.band AND b.key = r.key
        WHERE b.doc_id != r.root
    ),
    edges(a, b) AS (
        SELECT sa, sb FROM star UNION SELECT sb, sa FROM star
    ),
    reach(node, target) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.node, e.b FROM reach r JOIN edges e ON r.target = e.a
    ),
    reps AS (
        SELECT node AS doc_id, CAST(MIN(target) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY node
    ),
    lab AS (
        SELECT d.doc_id,
               CAST(COALESCE(r.cluster_rep, d.doc_id) AS BIGINT)
                   AS cluster_rep
        FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id
    )
    SELECT doc_id, cluster_rep,
           CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT)
               AS cluster_size,
           doc_id = cluster_rep AS is_rep
    FROM lab
    """,
)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash CLUSTER labeling — the structural fix for the
    quadratic-clones class (VERDICT r15 #6): at high duplication factors
    the TRUE near-dup PAIR set is itself quadratic (the 100x cloned
    replica drove dedup_simhash to 13.06e9 pairs — every cross-clone
    pair is a real pair), but a real pipeline doesn't want pairs, it
    wants one representative per duplicate cluster. This operator's
    output — (doc_id, cluster_rep, cluster_size, is_rep), one row per
    document — is O(docs) at ANY duplication factor, and so is every
    intermediate:

    * candidate edges are NEVER materialized pairwise. Each of the 4
      LSH band buckets contributes a STAR — every member linked to the
      bucket's minimum doc_id — so a bucket of s docs yields s-1 edges
      (the clique would be s(s-1)/2). Star edges preserve bucket
      connectivity exactly, so connected components over them equal
      components over dedup_simhash's full shared-band candidate graph.
    * components via the shared _connected_components machinery
      (distributed contraction above the 2M-edge cap, driver union-find
      under it; labels are component minima), reused from
      dedup_clusters.

    Semantics: cluster = connected component of the BAND-BUCKET
    candidate graph (standard LSH clustering as in large-corpus dedup
    pipelines — SlimPajama/RefinedWeb thin by LSH-bucket connectivity).
    This is a superset-coarsening of dedup_simhash's Hamming<=8
    verified pairs: pairwise verification cannot scale to quadratic
    clone sets, and component labels built by chaining verified pairs
    are already transitive approximations; the band-connectivity
    cluster is the honest O(N) contract. Docs with no fingerprint
    (empty/NULL text) are singletons via the left join. Total order: the
    output is keyed by doc_id, so the whole relation is hash-stable.

    Scale shape: fingerprints (one corpus shuffle, Arrow kernel) ->
    4 band rows/doc -> groupBy(band,key) min (map-side combine) ->
    one equi-join back -> <=4N star edges -> CC -> one window over docs
    for cluster_size. No step is super-linear in the corpus.
    """
    docs = simhash_fingerprints(spark, sf_dir)
    band_keys = [
        F.col("h_lo").bitwiseAND(65535),
        F.shiftright("h_lo", 16).bitwiseAND(65535),
        F.col("h_hi").bitwiseAND(65535),
        F.shiftright("h_hi", 16).bitwiseAND(65535),
    ]
    bands = docs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), band_keys[i].alias("key"))
                for i in range(4)
            ])
        ).alias("bk"),
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    roots = bands.groupBy("band", "key").agg(F.min("doc_id").alias("root"))
    star = (
        bands.join(roots, ["band", "key"])
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    from pyspark.sql.window import Window

    labels = _connected_components(spark, star)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    lab = d.join(labels, d["doc_id"] == labels["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_rep"),
    )
    size_w = Window.partitionBy("cluster_rep")
    return lab.select(
        "doc_id",
        "cluster_rep",
        F.count(F.lit(1)).over(size_w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_rep"),
    )


@query(
    "dedup_minhash_clusters",
    oracle=_DUCK_SHINGLES.replace("WITH words", "WITH RECURSIVE words")
    + _mh_sigs_duck(_MINHASH_LANES)
    + f"""
    , bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            + ", ".join(f"mh{b * 4 + r} AS k{r}" for r in range(4))
            + " FROM sigs"
            for b in range(_MINHASH_BANDS)
        )}
    ),
    roots AS (
        SELECT band, k0, k1, k2, k3, MIN(doc_id) AS root
        FROM bands GROUP BY band, k0, k1, k2, k3
    ),
    star AS (
        SELECT DISTINCT r.root AS sa, b.doc_id AS sb
        FROM bands b JOIN roots r
          ON b.band = r.band AND b.k0 = r.k0 AND b.k1 = r.k1
         AND b.k2 = r.k2 AND b.k3 = r.k3
        WHERE b.doc_id != r.root
    ),
    edges(a, b) AS (
        SELECT sa, sb FROM star UNION SELECT sb, sa FROM star
    ),
    reach(node, target) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.node, e.b FROM reach r JOIN edges e ON r.target = e.a
    ),
    reps AS (
        SELECT node AS doc_id, CAST(MIN(target) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY node
    ),
    lab AS (
        SELECT d.doc_id,
               CAST(COALESCE(r.cluster_rep, d.doc_id) AS BIGINT)
                   AS cluster_rep
        FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id
    )
    SELECT doc_id, cluster_rep,
           CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT)
               AS cluster_size,
           doc_id = cluster_rep AS is_rep
    FROM lab
    """,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH CLUSTER labeling — the structural O(docs) contract
    (VERDICT r15 #6) applied to the MinHash family, completing the pair
    with dedup_simhash_clusters: each of the 4 minhash band buckets
    (keyed by the raw 4-tuple of md5-derived 48-bit lanes) contributes
    a STAR to its bucket minimum; connected components over the stars
    label every document with a cluster representative. One row per
    document — (doc_id, cluster_rep, cluster_size, is_rep) — at ANY
    duplication factor, with every intermediate linear too (s-1 star
    edges per bucket of s vs the s(s-1)/2 candidate pairs
    dedup_near_minhash must verify).

    Semantics: cluster = connected component of the LSH candidate
    graph (band-bucket connectivity, no Jaccard verification — the
    honest O(N) coarsening of the verified pair set, same rationale as
    the simhash variant's docstring). Shingle-less docs are singletons.
    Shares shingle_index + the md5 lane derivation with
    dedup_near_minhash, so the DuckDB oracle reproduces signatures,
    buckets, stars and components value-for-value.

    Scale shape: shingle index (session-persisted) -> one signature
    groupBy -> 4 band rows/doc -> bucket-min groupBy (map-side
    combine) -> one equi-join back -> <=4N star edges -> CC -> one
    window for cluster_size. Never super-linear in the corpus."""
    from pyspark.sql.window import Window

    idx = shingle_index(spark, sf_dir)
    sigs = _mh_sigs_spark(idx, _MINHASH_LANES)
    key_cols = ["band", "k0", "k1", "k2", "k3"]
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        *[
                            F.col(f"mh{b * 4 + r}").alias(f"k{r}")
                            for r in range(4)
                        ],
                    )
                    for b in range(_MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *[F.col(f"bk.{c}").alias(c) for c in key_cols])
    roots = bands.groupBy(*key_cols).agg(F.min("doc_id").alias("root"))
    star = (
        bands.join(roots, key_cols)
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    labels = _connected_components(spark, star)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    lab = d.join(labels, d["doc_id"] == labels["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_rep"),
    )
    size_w = Window.partitionBy("cluster_rep")
    return lab.select(
        "doc_id",
        "cluster_rep",
        F.count(F.lit(1)).over(size_w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).alias("is_rep"),
    )


MAX_COSINE_BLOCKS = 64


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = 64
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
          AND list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[])) > 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           floor(list_dot_product(a.e, b.e) / (a.nrm * b.nrm) * 1e6 + 0.5)
             / 1e6 AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE floor(list_dot_product(a.e, b.e) / (a.nrm * b.nrm) * 1e6 + 0.5)
            / 1e6 >= 0.4
    """,
)
def dedup_embedding_cosine(
    spark: SparkSession,
    sf_dir: str,
    block_rows: int = 100_000,
    max_blocks: int = MAX_COSINE_BLOCKS,
) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= 0.4, blocked matmul.

    Physical shape: the corpus is split into hash blocks of at most
    ``block_rows`` vectors; each block is broadcast in turn and every
    partition's rows multiply against it with one numpy/BLAS matmul per
    Arrow batch, emitting only the pairs above threshold. One block (the
    common case at test scale) is the classic one-side-fits-in-memory
    broadcast similarity join; more blocks is the standard blocked
    all-pairs sweep — |corpus|/block_rows passes over the probe side, each
    bounded by the broadcast cap, so the op *degrades* past the cap instead
    of refusing. (For 100 TB-scale corpora the quadratic sweep is the
    honest cost of EXACT all-pairs; sim_ann_lsh is the sub-quadratic
    approximate route.) The per-pair threshold compares the ROUNDED cosine
    on both engines — numpy/BLAS and DuckDB sum in different orders, so a
    pair sitting within float error of 0.4 must be quantized before the
    cut, not after.

    Vector-validity contract (r11, shared with llm/similarity.py):
    NULL / ragged / zero-norm vectors are excluded on both engines —
    np.vstack crashes on a None row and a zero norm divides by zero, so
    degenerate rows must never reach the matmul kernel.
    """
    import math as _math

    import numpy as np
    import pyspark.sql.types as T

    from databricks_feature_store_poc_spark.llm.similarity import (
        _VALID_VEC_SPARK,
        DIM,
    )

    e = load_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.expr(_VALID_VEC_SPARK.format(dim=DIM))).select(
        "vec_id", "embedding"
    )
    n = probe.count()
    n_blocks = max(1, _math.ceil(n / block_rows))
    # Refuse the quadratic sweep past max_blocks (default 64 passes =
    # 6.4M vectors at the default block size): each pass is a sequential
    # driver-collect + broadcast, so beyond this the wall-clock is the
    # number of passes, not Spark. Exact all-pairs at that scale is a
    # deliberate choice the caller must opt into by raising max_blocks;
    # the designed scale routes are sim_ann_lsh (LSH buckets + exact
    # verify) and sim_ivf_topk (IVF probe join), both sub-quadratic.
    if n_blocks > max_blocks:
        raise ValueError(
            f"dedup_embedding_cosine: {n} vectors need {n_blocks} "
            f"sequential broadcast passes (> max_blocks={max_blocks}); "
            "exact all-pairs is quadratic at this scale — use "
            "sim_ann_lsh or sim_ivf_topk, or raise max_blocks/"
            "block_rows to force the exact sweep."
        )

    schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def one_block(rows):
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        bc = spark.sparkContext.broadcast((ids, mat, norms))
        one_block.last_bc = bc

        def block_pairs(batches, _bc=bc):
            import pandas as pd

            b_ids, b_mat, b_norms = _bc.value
            for pdf in batches:
                a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
                a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
                # floor(x*1e6 + 0.5)/1e6, NOT np.round: np.round is
                # half-to-even while DuckDB's round() is half-away —
                # a cosine landing on a 6th-decimal tie would quantize
                # differently. This single convention is written
                # identically in the oracle, so ties agree by
                # construction (all emitted values are positive).
                cos = np.floor(
                    (a_mat @ b_mat.T) / np.outer(a_norms, b_norms) * 1e6
                    + 0.5
                ) / 1e6
                ai, bi = np.nonzero(
                    (cos >= 0.4) & (a_ids[:, None] < b_ids[None, :])
                )
                yield pd.DataFrame(
                    {
                        "vec_a": a_ids[ai],
                        "vec_b": b_ids[bi],
                        "cosine": cos[ai, bi],
                    }
                )

        return probe.mapInPandas(block_pairs, schema)

    if n == 0:
        # degenerate corpus (r11): no valid vectors — np.array([]) would
        # reach the matmul as a 1-D array and crash on axis=1
        return spark.createDataFrame([], schema)
    if n_blocks == 1:
        return one_block(probe.collect())
    # Blocked-both-sides: each vector belongs to exactly one hash block, so
    # each ordered pair (a < b) is emitted exactly once — by the pass that
    # broadcasts b's block. Each pass runs EAGERLY (localCheckpoint) and
    # its broadcast is destroyed before the next block is collected, so at
    # any moment the driver + executors hold ONE block plus the (small,
    # threshold-filtered) checkpointed pair results — without the eager
    # pass, every block's broadcast would stay pinned until the lazy union
    # executed, rebuilding the exact O(corpus) memory condition the cap
    # exists to prevent.
    parts = []
    for blk in range(n_blocks):
        rows = probe.filter(
            F.pmod(F.hash("vec_id"), F.lit(n_blocks)) == blk
        ).collect()
        if rows:
            part = _ckpt(one_block(rows))
            one_block.last_bc.destroy()
            parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "dedup_clusters",
    oracle=_DUCK_SHINGLES.replace("WITH words", "WITH RECURSIVE words") + f"""
    , shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT s.doc_a, s.doc_b
        FROM shared s
        JOIN doc_sizes sa ON s.doc_a = sa.doc_id
        JOIN doc_sizes sb ON s.doc_b = sb.doc_id
        WHERE s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
              >= {JACCARD_THRESHOLD}
    ),
    edges(a, b) AS (
        SELECT doc_a, doc_b FROM pairs UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, target) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.node, e.b FROM reach r JOIN edges e ON r.target = e.a
    ),
    reps AS (
        SELECT node AS doc_id, CAST(MIN(target) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           CAST(COALESCE(r.cluster_rep, d.doc_id) AS BIGINT) AS cluster_rep
    FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-Jaccard pair
    graph, every document labeled with its cluster representative (the
    component's minimum doc_id; singletons represent themselves). This is
    the step that turns pairwise dedup output into an actionable keep/drop
    decision — keep each cluster's rep, drop the rest.

    Execution (see _connected_components): distributed contraction passes
    (per-batch union-find -> spanning forest) shrink the edge set while
    it exceeds the driver cap — near-dup edge sets are usually far below
    it already — then driver union-find finishes. The oracle computes the
    same fixpoint via DuckDB's recursive CTE.
    """
    d = load_table(spark, sf_dir, "documents")
    idx = shingle_index(spark, sf_dir)
    pairs = _jaccard_pairs_from_index(idx).select("doc_a", "doc_b")
    labels = _connected_components(spark, pairs)
    out = (
        d.select("doc_id")
        .join(labels, d["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_rep"),
        )
    )
    return out


# Edge-count cap for the driver union-find finish. 2M edges is ~32 MB of
# longs on the driver — trivial — while near-dup edge sets at corpus
# scale sit far below |documents| (at sf0.1: 256 edges over 5k docs,
# because pairs must survive the exact-Jaccard threshold). Above the cap,
# distributed contraction passes shrink the edge set first.
SMALL_GRAPH_EDGE_CAP = 2_000_000
# Contraction passes before the driver finish. Each pass replaces every
# partition's edges with a union-find spanning forest of that partition —
# edge count after a pass is bounded by the number of non-singleton
# nodes and in practice collapses near-dup graphs in one or two passes.
MAX_CONTRACT_PASSES = 6


def _spanning_forest_pass(pairs: DataFrame) -> DataFrame:
    """One distributed contraction: per Arrow batch, union-find the
    batch's edges and emit only the spanning forest (node -> its batch
    root). Preserves connectivity exactly — a spanning forest connects
    everything its edge set connected — while shrinking edges to at most
    (#distinct nodes in batch - #components in batch)."""

    def contract(batches):
        import pandas as pd

        for pdf in batches:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
                a, b = int(a), int(b)
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            out_a, out_b = [], []
            for n in parent:
                r = find(n)
                if r != n:
                    out_a.append(r)
                    out_b.append(n)
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return pairs.mapInPandas(contract, "doc_a long, doc_b long")


def _connected_components(
    spark: SparkSession, pairs: DataFrame, edge_cap: int = SMALL_GRAPH_EDGE_CAP
) -> DataFrame:
    """(node, label) for every node in `pairs`; label = component minimum.

    Contraction + finish — the filtering CC algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public):
    while the edge set exceeds `edge_cap`, run a distributed contraction
    pass (per-batch union-find -> spanning forest, edges repartitioned on
    doc_a between passes so components co-locate and collapse), then
    collect the shrunken edge list and finish with driver union-find
    (path compression, union toward the smaller root so labels are
    component minima). Connectivity is preserved exactly by every pass.

    Why not iterative label propagation: its round count is graph-
    dependent (diameter, or log n with pointer jumping) and each round
    is a full join+aggregate job wave; contraction needs O(1) passes on
    real near-dup graphs and each pass is one map (the repartition is
    the only shuffle). Deterministic labels; parity across paths is
    pinned in tests/test_llm.py and property-tested on random graphs.
    """
    pairs = pairs.persist()
    n_edges = pairs.count()
    passes = 0
    while n_edges > edge_cap and passes < MAX_CONTRACT_PASSES:
        contracted = _spanning_forest_pass(
            pairs.repartition(max(32, pairs.rdd.getNumPartitions()), "doc_a")
        ).persist()
        n_after = contracted.count()
        pairs.unpersist()
        pairs = contracted
        passes += 1
        if n_after >= n_edges:  # no further shrink possible
            break
        n_edges = n_after

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Under the cap a plain collect is ONE job; toLocalIterator would run
    # one job per cached partition (32 round-trips for a 25-edge graph).
    # The cap bounds driver memory at ~32 MB of longs, so collect is safe;
    # the streaming iterator is kept only for the gave-up-contracting path
    # where the edge list may still exceed the cap.
    edge_rows = (
        pairs.collect() if n_edges <= edge_cap else pairs.toLocalIterator()
    )
    for row in edge_rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union toward the smaller root keeps labels = component min
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    labels = [(n, find(n)) for n in parent]
    pairs.unpersist()
    return spark.createDataFrame(labels, "node long, label long")


@query(
    "dedup_minhash_audit",
    oracle=_DUCK_SHINGLES + f"""
    , shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact_pairs AS (
        SELECT s.doc_a, s.doc_b
        FROM shared s
        JOIN doc_sizes sa ON s.doc_a = sa.doc_id
        JOIN doc_sizes sb ON s.doc_b = sb.doc_id
        WHERE s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
              >= {JACCARD_THRESHOLD}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS precision_ok,
           TRUE AS recall_ok
    FROM exact_pairs
    """,
)
def dedup_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH contract made oracle-checkable (the same move the
    ANN recall audits use): one row carrying the exact near-dup pair
    count plus two in-plan booleans — precision (every LSH-emitted pair
    IS an exact pair: the exact-verify step guarantees it, and a
    verification bug flips this to FALSE) and recall >= 0.8 of the
    exact pair set (measured 1.0 at sf0.001/0.01; the banded-LSH
    catch probability at jaccard >= 0.3 is p = 1-(1-j^4)^4). The oracle
    recomputes the exact pair count independently and asserts both
    booleans literally — LSH internals (hash seeds, band keys) never
    reach the hashed output, so the check is engine-stable.

    Scale: one full-outer join of two pair sets that are each
    bucket-bounded (never all-pairs), then a single 1-row aggregate."""
    exact = _jaccard_pairs_from_index(shingle_index(spark, sf_dir)).select(
        "doc_a", "doc_b"
    ).withColumn("in_exact", F.lit(1))
    mh = dedup_near_minhash(spark, sf_dir).select("doc_a", "doc_b").withColumn(
        "in_mh", F.lit(1)
    )
    flags = exact.join(mh, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_exact", F.lit(0)).alias("e"),
        F.coalesce("in_mh", F.lit(0)).alias("m"),
    )
    # coalesce: SUM over zero pairs is NULL, which would NULL all three
    # outputs on a degenerate corpus (r11) — zero pairs is a PASS
    agg = flags.agg(
        F.coalesce(F.sum("e"), F.lit(0)).alias("n_exact"),
        F.coalesce(F.sum(F.col("e") * F.col("m")), F.lit(0)).alias("n_both"),
        F.coalesce(
            F.sum(F.col("m") * (1 - F.col("e"))), F.lit(0)
        ).alias("n_mh_only"),
    )
    return agg.select(
        F.col("n_exact").cast("long").alias("n_exact_pairs"),
        (F.col("n_mh_only") == 0).alias("precision_ok"),
        (F.col("n_both") >= F.col("n_exact") * 0.8).alias("recall_ok"),
    )


@query(
    "dedup_simhash_audit",
    oracle=_DUCK_SHINGLES + f"""
    , shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact_pairs AS (
        SELECT s.doc_a, s.doc_b
        FROM shared s
        JOIN doc_sizes sa ON s.doc_a = sa.doc_id
        JOIN doc_sizes sb ON s.doc_b = sb.doc_id
        WHERE s.shared * 1.0 / (sa.n_shingles + sb.n_shingles - s.shared)
              >= {JACCARD_THRESHOLD}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS guarantee_recall_ok,
           TRUE AS radius_ok,
           TRUE AS signal_ok
    FROM exact_pairs
    """,
)
def dedup_simhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash contract made oracle-checkable — the audit-twin move
    dedup_minhash_audit uses, adapted to what banded SimHash actually
    guarantees (VERDICT r6 'do this' #2). SimHash approximates COSINE of
    the word-indicator vectors, not Jaccard, and 4x16 banding only
    pigeonhole-guarantees recall at Hamming <= 3 — so a minhash-style
    "recall >= 0.8 of all Jaccard pairs" boolean would be dishonest
    (measured: several jaccard>0.95 pairs sit at Hamming 4..16 with no
    shared band). The three booleans that ARE the contract:

    - ``guarantee_recall_ok``: every exact-Jaccard pair whose true
      fingerprint Hamming distance is <= 3 appears in the emitted pair
      set — the deterministic pigeonhole guarantee; a band-join bug
      flips it false.
    - ``radius_ok``: no emitted pair exceeds Hamming 8 (the emission
      filter's own bound, re-derived from the fingerprints).
    - ``signal_ok``: the mean Hamming distance over exact near-dup
      pairs is <= 16 — half the 32-bit expectation of independent
      fingerprints (measured ~5 at sf0.001/0.01/0.1); the statistical
      property that makes SimHash a near-dup signal at all.

    The checked value column is the exact-Jaccard pair count, which the
    DuckDB oracle recomputes independently; fingerprint bits
    never reach the hashed output. Scale: the Hamming re-derivation
    joins fingerprints onto the bucket-bounded exact pair set only —
    cost O(exact pairs), never all-pairs.
    """
    fp = simhash_fingerprints(spark, sf_dir)
    exact = _jaccard_pairs_from_index(shingle_index(spark, sf_dir))
    fa = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_lo").alias("a_lo"), F.col("h_hi").alias("a_hi"),
    )
    fb = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_lo").alias("b_lo"), F.col("h_hi").alias("b_hi"),
    )
    emitted = dedup_simhash(spark, sf_dir)
    ex = (
        exact.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming_fp",
            F.expr("bit_count(a_lo ^ b_lo) + bit_count(a_hi ^ b_hi)").cast("int"),
        )
        .join(
            emitted.select("doc_a", "doc_b", F.lit(1).alias("in_emitted")),
            ["doc_a", "doc_b"],
            "left",
        )
    )
    ex_agg = ex.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_if(
            (F.col("hamming_fp") <= 3) & F.col("in_emitted").isNull()
        ).alias("n_guaranteed_missed"),
        F.avg("hamming_fp").alias("avg_hamming"),
    )
    em_agg = emitted.agg(F.max("hamming").alias("max_emitted_hamming"))
    return ex_agg.crossJoin(F.broadcast(em_agg)).select(
        F.col("n_exact").cast("long").alias("n_exact_pairs"),
        (F.col("n_guaranteed_missed") == 0).alias("guarantee_recall_ok"),
        (F.coalesce("max_emitted_hamming", F.lit(0)) <= 8).alias("radius_ok"),
        (F.coalesce("avg_hamming", F.lit(0.0)) <= 16.0).alias("signal_ok"),
    )


_SAMPLE_BANDS_ORACLE = _DUCK_SHINGLES + _mh_sigs_duck(4) + """
    , buckets AS (
        SELECT min(doc_id) AS doc_id,
               CAST(count(*) AS BIGINT) AS bucket_size
        FROM sigs GROUP BY mh0, mh1, mh2, mh3
    )
    SELECT doc_id, bucket_size, TRUE AS has_signature FROM buckets
    UNION ALL
    SELECT doc_id, CAST(1 AS BIGINT), FALSE
    FROM (SELECT DISTINCT doc_id FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM sigs s
                            WHERE s.doc_id = d.doc_id))
"""


@query("sample_minhash_diverse", oracle=_SAMPLE_BANDS_ORACLE)
def sample_minhash_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-stratified diversity subsample (VERDICT r14 #8's named
    stretch): keep ONE representative document (min doc_id) per LSH
    bucket — the 4-lane minhash signature — so downsampling
    preferentially drops near-duplicates instead of sampling them
    proportionally (the standard corpus-thinning step before expensive
    training passes: a cluster of 1000 boilerplate variants contributes
    one doc, a unique doc always survives). Emits each kept doc with its
    bucket size (the dedup mass it represents).

    Documents with no signature — fewer than SHINGLE_WORDS words, empty
    or NULL text — cannot be near-dup-bucketed and are kept
    unconditionally as singleton buckets (has_signature = FALSE), so
    the sample always COVERS the corpus: every distinct doc_id is
    represented by exactly one output row's bucket (total coverage
    pinned in tests).

    FULLY deterministic and oracle-checked end-to-end: the md5-derived
    minhash lanes (same `_mh_lane_*` pair as dedup_near_minhash)
    reproduce bit-identically in DuckDB, so bucket membership, the
    min-doc_id representative, and bucket sizes all hash-match.

    Scale shape: shingle index (one shuffle) -> 4-lane signature groupBy
    (one) -> bucket groupBy (one, histogram-sized output) -> anti-join
    for the no-signature remainder. Never all-pairs, no driver state;
    the output is O(distinct buckets + unshingleable docs)."""
    idx = shingle_index(spark, sf_dir)
    sigs = _mh_sigs_spark(idx, 4)
    buckets = (
        sigs.groupBy("mh0", "mh1", "mh2", "mh3")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("bucket_size"),
        )
        .select("doc_id", "bucket_size", F.lit(True).alias("has_signature"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id").distinct()
    nosig = docs.join(sigs.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.lit(1).cast("long").alias("bucket_size"),
        F.lit(False).alias("has_signature"),
    )
    return buckets.unionByName(nosig)
