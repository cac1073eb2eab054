"""Property-based tests (hypothesis) on operator algebra — SURVEY §5 item 3.

Each property runs on small generated inputs (Spark jobs are the cost
driver, so examples are capped) and pins an algebraic law rather than a
golden value: dedup idempotence, lookup spine preservation, hash-split
partition laws, fingerprint determinism.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=24), min_size=1, max_size=12
)


@given(texts=texts)
@_settings
def test_dedup_exact_idempotent(spark, texts):
    """dedup(dedup(X)) == dedup(X): one row per distinct text, total
    conserved."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = (
        df.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
    )
    kept = once.count()
    assert kept == len(set(texts))
    twice = once.groupBy("h").agg(F.count(F.lit(1)).alias("n2"))
    assert twice.filter(F.col("n2") > 1).count() == 0


@given(
    spine_keys=st.lists(st.integers(0, 20), min_size=1, max_size=30),
    feat_keys=st.sets(st.integers(0, 20), min_size=0, max_size=21),
)
@_settings
def test_lookup_preserves_spine_count(spark, spine_keys, feat_keys):
    """Left lookup against a unique-PK feature table NEVER changes the
    spine row count — with any duplication pattern in the spine and any
    match/unmatch mix (the reference's 21-dup-pair invariant, generalized)."""
    spine = spark.createDataFrame([(k,) for k in spine_keys], ["k"])
    feat = spark.createDataFrame(
        [(k, float(k)) for k in sorted(feat_keys)], schema="k bigint, v double"
    )
    ts = create_training_set(
        spark, spine, [FeatureLookup.of("f", ["v"], "k")],
        resolve_table={"f": feat}.__getitem__,
    )
    out = ts.load_df()
    assert out.count() == len(spine_keys)
    matched = out.filter(F.col("v").isNotNull()).count()
    assert matched == sum(1 for k in spine_keys if k in feat_keys)


@given(keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=200))
@_settings
def test_hash_split_partition_laws(spark, keys):
    """The multiplicative-hash split is disjoint, exhaustive, and
    deterministic for arbitrary key sets."""
    df = spark.createDataFrame([(k,) for k in sorted(keys)], ["k"])
    bucket = ((F.col("k") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(100)
    labeled = df.withColumn("split", F.when(bucket < 80, "train").otherwise("test"))
    n = labeled.count()
    n_train = labeled.filter(F.col("split") == "train").count()
    n_test = labeled.filter(F.col("split") == "test").count()
    assert n_train + n_test == n == len(keys)
    again = {
        r["k"]: r["split"] for r in df.withColumn(
            "split", F.when(bucket < 80, "train").otherwise("test")
        ).collect()
    }
    first = {r["k"]: r["split"] for r in labeled.collect()}
    assert first == again


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3),            # user
                  st.integers(0, 40) ,          # day offset
                  st.integers(0, 9999)),        # cents value
        min_size=1, max_size=40,
    )
)
@_settings
def test_rolling_sum_matches_python_reference(spark, events):
    """Trailing 7-day sum equals a brute-force Python computation for
    arbitrary small event sets (dup timestamps included)."""
    import datetime

    from databricks_feature_store_poc_spark.operators.rolling import rolling_range_sum

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, base + datetime.timedelta(days=d), cents / 100.0)
        for i, (u, d, cents) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = rolling_range_sum(df, "user_id", "ts", "value", 7, "sum_7d").collect()
    for r in out:
        expect = round(sum(
            v for (_, u, t, v) in rows
            if u == r["user_id"] and r["ts"] - datetime.timedelta(days=7) <= t <= r["ts"]
        ), 2)
        assert abs(r["sum_7d"] - expect) < 1e-9, (r, expect)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=25
    )
)
@_settings
def test_connected_components_vs_pure_python(spark, edges):
    """Hybrid CC (union-find fast path) matches a pure-python reference
    union-find on arbitrary generated graphs — component labels are the
    component minimum for every node."""
    from databricks_feature_store_poc_spark.llm.dedup import _connected_components

    pairs = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        (r["node"], r["label"])
        for r in _connected_components(spark, df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


@given(
    hot=st.integers(0, 3),
    n_tail=st.integers(0, 60),
)
@_settings
def test_heavy_hitter_sketch_superset_on_skew(spark, hot, n_tail):
    """Misra-Gries candidates are a superset of true heavy hitters even
    with a tiny capacity, on a skewed stream (one hot key + uniform
    tail). Mirrors agg_heavy_hitters' candidate stage with CAP=4."""
    import pandas as pd

    CAP = 4
    rows = [("hot", hot_i) for hot_i in range(40 + hot * 20)] + [
        (f"t{i % 17}", i) for i in range(n_tail)
    ]
    pdf = pd.DataFrame(rows, columns=["k", "i"])

    counts: dict = {}
    for k in pdf["k"]:
        if k in counts:
            counts[k] += 1
        elif len(counts) < CAP:
            counts[k] = 1
        else:
            dead = []
            for kk in counts:
                counts[kk] -= 1
                if counts[kk] == 0:
                    dead.append(kk)
            for kk in dead:
                del counts[kk]
    n = len(pdf)
    true_hh = {
        k for k, c in pdf["k"].value_counts().items() if c > n // CAP
    }
    assert true_hh <= set(counts), (true_hh, counts)


@given(
    n_words=st.integers(0, 12),
    width=st.sampled_from([2, 5, 8]),
)
@_settings
def test_shingle_expr_counts_and_short_docs(spark, n_words, width):
    """shingle_expr yields exactly max(0, n-width+1) shingles for distinct
    words and never crashes below the width (the slice(., 0, w) trap)."""
    from databricks_feature_store_poc_spark.llm.dedup import shingle_expr

    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(text,)], "text string").selectExpr(
        r"filter(split(text, '\\s+'), x -> x != '') AS words"
    )
    out = df.selectExpr(f"size({shingle_expr(width)}) AS n").collect()[0]["n"]
    assert out == max(0, n_words - width + 1)


# -- canonical-bucket interval join (join_interval_overlap's core math) -----

_W = 30  # bucket width, days


def _buckets(start: int, end: int) -> range:
    """Buckets a [start, end) interval covers (end exclusive)."""
    return range(start // _W, (end - 1) // _W + 1)


@given(
    a=st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, _W)), min_size=1, max_size=25
    ),
    b=st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, _W)), min_size=1, max_size=25
    ),
)
@settings(max_examples=200, deadline=None)
def test_canonical_bucket_counts_each_overlap_exactly_once(a, b):
    """The bucketized range join's dedup rule — keep a pair only in the
    LATER of the two start buckets — must count every truly-overlapping
    pair exactly once and never fabricate a pair, for any interval sets
    whose spans don't exceed the bucket width (join_interval_overlap's
    precondition)."""
    A = [(s, s + d) for s, d in a]
    B = [(s, s + d) for s, d in b]
    brute = sum(
        1 for (as_, ae) in A for (bs, be) in B if as_ < be and bs < ae
    )
    bucketized = 0
    for (as_, ae) in A:
        for (bs, be) in B:
            if not (as_ < be and bs < ae):
                continue
            canonical = max(as_ // _W, bs // _W)
            # counted once iff the canonical bucket is covered by both
            hits = sum(
                1
                for k in _buckets(as_, ae)
                if k in _buckets(bs, be) and k == canonical
            )
            bucketized += hits
    assert bucketized == brute


# --- round-6 primitives ----------------------------------------------------


@given(
    xy=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_morton_interleave_roundtrip(xy):
    """The 32 interleave terms must place every bit of x on even and
    every bit of y on odd positions — deinterleaving recovers (x, y)
    exactly, and the code preserves lexicographic locality at bit
    granularity (pure-Python mirror of the SQL arithmetic)."""
    from databricks_feature_store_poc_spark.operators.zorder import BITS

    for x, y in xy:
        z = 0
        for i in range(BITS):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(BITS))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(BITS))
        assert (rx, ry) == (x, y)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(10, 16)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_matches_pure_python_reference(spark, edges):
    """The Spark fixed-point PageRank must equal a 20-line pure-Python
    implementation of the same integer recurrence on arbitrary small
    bipartite graphs — partition count cannot matter (exact integers)."""
    from databricks_feature_store_poc_spark.operators.graph import (
        ITERS,
        SCALE,
        pagerank,
    )

    bi = sorted({(a, b) for a, b in edges})
    both = bi + [(b, a) for a, b in bi]
    df = spark.createDataFrame(both, "src long, dst long").repartition(7)
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}

    outdeg: dict[int, int] = {}
    for s, _ in both:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(outdeg)
    base = (15 * (SCALE // n)) // 100
    rank = {v: SCALE // n for v in outdeg}
    for _ in range(ITERS):
        inbound: dict[int, int] = {}
        for s, d in both:
            inbound[d] = inbound.get(d, 0) + rank[s] // outdeg[s]
        rank = {d: base + (85 * v) // 100 for d, v in inbound.items()}
    assert got == rank


@given(
    n_words=st.integers(0, 60),
    size=st.integers(2, 20),
    stride=st.integers(1, 20),
)
@settings(max_examples=40, deadline=None)
def test_chunk_grid_covers_every_word(n_words, size, stride):
    """For any (size, stride), the start grid 0, stride, 2*stride, ...
    (up to max(n-1, 0)) covers every word index when stride <= size,
    and chunk_idx is dense — the pure arithmetic the SQL sequence()
    encodes."""
    starts = list(range(0, max(n_words - 1, 0) + 1, stride))
    assert starts[0] == 0
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + size, n_words)))
    if stride <= size:
        assert covered == set(range(n_words))
    assert len(starts) == (max(n_words - 1, 0)) // stride + 1


@given(
    old_rows=st.dictionaries(
        st.integers(0, 15), st.one_of(st.none(), st.integers(-5, 5)),
        max_size=12,
    ),
    new_rows=st.dictionaries(
        st.integers(0, 15), st.one_of(st.none(), st.integers(-5, 5)),
        max_size=12,
    ),
)
@_settings
def test_snapshot_diff_reconstructs_new(spark, old_rows, new_rows):
    """apply(old, snapshot_diff(old, new)) == new, for ANY pair of
    snapshots including NULL values and NULL transitions: deletes
    removed, inserts added, updates replaced, untouched keys carried
    through unchanged. The feed is complete and minimal — exactly the
    CDF contract delta_sync and incremental consumers rely on."""
    from databricks_feature_store_poc_spark.featurestore.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(k, v) for k, v in old_rows.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [(k, v) for k, v in new_rows.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())

    feed = {
        r["k"]: (r["action"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # minimality: every feed row changes something
    for k, (action, _) in feed.items():
        assert (k in old_rows) != (k in new_rows) or (
            action == "update" and old_rows[k] != new_rows[k]
        )
    # completeness: applying the feed to old reproduces new exactly
    rebuilt = dict(old_rows)
    for k, (action, new_v) in feed.items():
        if action == "delete":
            rebuilt.pop(k)
        else:
            rebuilt[k] = new_v
    assert rebuilt == new_rows
