"""Golden-fixture + unit tests for the feature-store core (SURVEY §5).

The golden fixture reproduces the reference datasets' *shape* exactly
(SURVEY §1.3: 100 unique-keyed customer rows, 50 product rows, a 500-row
spine with 21 duplicate (customer_id, product_id) pairs and a 293/207
label balance, unmatched keys) and asserts the training-set semantics the
reference depends on: 500x5 output matrix, spine-count preservation under
duplicate spine keys, NULL features for unmatched keys, label balance
carried through.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_feature_store_poc_spark.featurestore.lookup import (
    FeatureLookup,
    create_training_set,
)
from databricks_feature_store_poc_spark.featurestore.online import OnlineStore
from databricks_feature_store_poc_spark.featurestore.store import (
    FeatureStore,
    PrimaryKeyViolation,
)


@pytest.fixture(scope="module")
def reference_shaped(spark):
    """Synthetic datasets with the reference CSVs' documented shape
    (SURVEY §1.3) — built deterministically, not copied."""
    customers = spark.createDataFrame(
        [(i, float(i) * 1.5, float(i) * 4.0) for i in range(1, 101)],
        ["customer_id", "total_purchase_7d", "total_purchase_30d"],
    )
    categories = ["Automotive", "Beauty", "Books", "Clothing", "Electronics",
                  "Food", "Health", "Home & Garden", "Sports", "Toys"]
    products = spark.createDataFrame(
        [(i, categories[i % 10]) for i in range(1, 51)],
        ["product_id", "category"],
    )
    # 500-row spine: 479 unique pairs + 21 duplicated pairs; 293 positive
    # labels; customer_id 101-105 rows have no customer match (NULL feats).
    rows = []
    for i in range(479):
        cust = (i % 105) + 1          # 101..105 -> unmatched customers
        prod = (i % 50) + 1
        rows.append((cust, prod, i % 2, 1 if i < 293 else 0))
    for i in range(21):               # exact duplicates of early rows
        cust = (i % 105) + 1
        prod = (i % 50) + 1
        rows.append((cust, prod, i % 2, 0))
    labels = spark.createDataFrame(
        rows, ["customer_id", "product_id", "on_sales", "purchased"]
    )
    return customers, products, labels


def _reference_training_set(spark, customers, products, labels):
    lookups = [
        FeatureLookup.of("customers", ["total_purchase_7d", "total_purchase_30d"],
                         "customer_id"),
        FeatureLookup.of("products", ["category"], "product_id"),
    ]
    tables = {"customers": customers, "products": products}
    return create_training_set(
        spark, labels, lookups, label="purchased",
        exclude_columns=["customer_id", "product_id"],
        resolve_table=tables.__getitem__,
    )


class TestGoldenFixture:
    def test_matrix_shape_500x5_minus_excluded(self, spark, reference_shaped):
        customers, products, labels = reference_shaped
        df = _reference_training_set(spark, customers, products, labels).load_df()
        # exclude_columns drops the two keys: 6 -> 5... the reference's
        # 500x5 matrix is (on_sales, 2 purchase features, category, label).
        assert df.count() == 500
        assert set(df.columns) == {
            "on_sales", "total_purchase_7d", "total_purchase_30d",
            "category", "purchased",
        }

    def test_spine_count_preserved_with_duplicate_pairs(self, spark, reference_shaped):
        customers, products, labels = reference_shaped
        # 21 duplicate (customer_id, product_id) pairs must NOT collapse or
        # fan out (feature PKs are unique) — reference SURVEY §1.3/§7.
        assert labels.count() == 500
        dups = (
            labels.groupBy("customer_id", "product_id")
            .count().filter(F.col("count") > 1).count()
        )
        assert dups == 21
        df = _reference_training_set(spark, customers, products, labels).load_df()
        assert df.count() == 500

    def test_unmatched_keys_get_null_features(self, spark, reference_shaped):
        customers, products, labels = reference_shaped
        df = _reference_training_set(spark, customers, products, labels).load_df()
        n_unmatched_spine = labels.filter(F.col("customer_id") > 100).count()
        assert n_unmatched_spine > 0
        assert df.filter(F.col("total_purchase_7d").isNull()).count() == n_unmatched_spine
        # matched rows carry real values
        assert df.filter(F.col("total_purchase_7d").isNotNull()).count() == 500 - n_unmatched_spine

    def test_label_balance_carried_through(self, spark, reference_shaped):
        customers, products, labels = reference_shaped
        df = _reference_training_set(spark, customers, products, labels).load_df()
        counts = {r["purchased"]: r["count"] for r in df.groupBy("purchased").count().collect()}
        assert counts == {1: 293, 0: 207}


class TestFeatureStore:
    def test_create_read_drop_roundtrip(self, spark, tmp_path):
        fs = FeatureStore(spark, meta_dir=str(tmp_path))
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
        meta = fs.create_table("fs_roundtrip", ["k"], df, description="test")
        assert meta.primary_keys == ["k"]
        back = fs.read_table("fs_roundtrip")
        assert sorted(r["k"] for r in back.collect()) == [1, 2]
        assert fs.get_metadata("fs_roundtrip").description == "test"
        fs.drop_table("fs_roundtrip")
        fs.drop_table("fs_roundtrip")  # idempotent

    def test_pk_uniqueness_rejected(self, spark, tmp_path):
        fs = FeatureStore(spark, meta_dir=str(tmp_path))
        df = spark.createDataFrame([(1, 1.0), (1, 2.0)], ["k", "v"])
        with pytest.raises(PrimaryKeyViolation, match="duplicate"):
            fs.create_table("fs_dup", ["k"], df)

    def test_pk_presence_rejected(self, spark, tmp_path):
        fs = FeatureStore(spark, meta_dir=str(tmp_path))
        df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
        with pytest.raises(PrimaryKeyViolation, match="not in columns"):
            fs.create_table("fs_missing", ["nope"], df)

    def test_malicious_identifier_rejected(self, spark, tmp_path):
        fs = FeatureStore(spark, meta_dir=str(tmp_path))
        df = spark.createDataFrame([(1,)], ["k"])
        for bad in ("a.b; DROP TABLE x", "../escape", "x'y", "a/b"):
            with pytest.raises(ValueError, match="identifier"):
                fs.create_table(bad, ["k"], df)
            with pytest.raises(ValueError, match="identifier"):
                fs.drop_table(bad)


class TestLookupSemantics:
    def test_feature_collision_raises(self, spark):
        spine = spark.createDataFrame([(1, 10.0)], ["k", "v"])
        feat = spark.createDataFrame([(1, 99.0)], ["k", "v"])
        lk = FeatureLookup.of("t", ["v"], "k")
        with pytest.raises(ValueError, match="collide"):
            create_training_set(
                spark, spine, [lk], resolve_table={"t": feat}.__getitem__
            ).load_df().collect()

    def test_collision_resolved_by_rename(self, spark):
        spine = spark.createDataFrame([(1, 10.0)], ["k", "v"])
        feat = spark.createDataFrame([(1, 99.0)], ["k", "v"])
        lk = FeatureLookup("t", ("v",), ("k",), rename={"v": "feat_v"})
        out = create_training_set(
            spark, spine, [lk], resolve_table={"t": feat}.__getitem__
        ).load_df()
        row = out.collect()[0]
        assert row["v"] == 10.0 and row["feat_v"] == 99.0

    def test_dict_lookup_key_splits(self, spark):
        lk = FeatureLookup.of("t", ["f"], {"spine_k": "table_k"})
        assert lk.spine_keys == ("spine_k",)
        assert lk.lookup_key == ("table_k",)

    def test_lineage_round_trips_spine_keys(self, spark):
        spine = spark.createDataFrame([(1,)], ["sk"])
        feat = spark.createDataFrame([(1, 2.0)], ["fk", "f"])
        lk = FeatureLookup("t", ("f",), ("fk",), spine_keys=("sk",))
        ts = create_training_set(
            spark, spine, [lk], resolve_table={"t": feat}.__getitem__
        )
        lin = ts.lineage()
        assert lin["lookups"][0]["spine_keys"] == ["sk"]


class TestOnlineStore:
    def test_lookup_equals_left_join(self, spark):
        feat = spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "b")], ["k", "x", "y"]
        )
        store = OnlineStore.from_table(feat, ["k"])
        assert store.lookup(1) == {"x": 1.0, "y": "a"}
        assert store.lookup(2) == {"x": 2.0, "y": "b"}
        assert store.lookup(99) is None  # left-join NULL semantics
        assert len(store) == 2

    def test_cap_enforced_single_pass(self, spark):
        feat = spark.createDataFrame([(i, float(i)) for i in range(10)], ["k", "x"])
        with pytest.raises(ValueError, match="online store"):
            OnlineStore.from_table(feat, ["k"], max_rows=5)


class TestOnlineLatency:
    def test_point_lookup_under_1ms(self, spark):
        """The reference's serving contract is <10 ms per lookup
        (README.md:115). The in-memory emulation must clear that with
        room: average over 10k lookups < 1 ms."""
        import time

        from databricks_feature_store_poc_spark.sources.catalog import load_table
        from tests.conftest import SF_TEST

        customer = load_table(spark, SF_TEST, "customer")
        store = OnlineStore.from_table(
            customer, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
        )
        keys = list(range(1, 1001))
        t0 = time.perf_counter()
        for _ in range(10):
            for k in keys:
                store.lookup(k)
        per_lookup = (time.perf_counter() - t0) / 10_000
        assert per_lookup < 0.001, f"{per_lookup*1e3:.3f} ms per lookup"


class TestPointInTimeLookup:
    def _run(self, spark, spine_rows, version_rows):
        import datetime

        def t(s):
            return datetime.datetime(2024, 1, s)

        spine = spark.createDataFrame(
            [(i, k, t(d)) for i, (k, d) in enumerate(spine_rows)],
            "row_id long, k long, ts timestamp",
        )
        versions = spark.createDataFrame(
            [(k, t(d), v) for (k, d, v) in version_rows],
            "k long, fts timestamp, val double",
        )
        lk = FeatureLookup(
            "v", ("val",), ("k",), spine_keys=("k",),
            timestamp_lookup_key=("ts", "fts"),
        )
        ts = create_training_set(
            spark, spine, [lk], resolve_table={"v": versions}.__getitem__
        )
        return {r["row_id"]: r["val"] for r in ts.load_df().collect()}

    def test_latest_version_at_or_before(self, spark):
        out = self._run(
            spark,
            spine_rows=[(1, 10), (1, 20), (1, 5)],
            version_rows=[(1, 5, 1.0), (1, 15, 2.0), (1, 25, 3.0)],
        )
        # day 10 -> version@5; day 20 -> version@15; day 5 -> version@5
        # (inclusive at equal timestamps)
        assert out == {0: 1.0, 1: 2.0, 2: 1.0}

    def test_no_prior_version_is_null_and_no_leakage(self, spark):
        out = self._run(
            spark,
            spine_rows=[(1, 2), (2, 10)],
            version_rows=[(1, 5, 9.9)],   # future version for key 1; none for 2
        )
        assert out == {0: None, 1: None}  # never a future value

    def test_pit_spine_count_preserved(self, spark):
        out = self._run(
            spark,
            spine_rows=[(1, 10), (1, 10), (1, 10)],  # duplicate spine rows
            version_rows=[(1, 1, 4.0), (1, 2, 5.0)],
        )
        assert out == {0: 5.0, 1: 5.0, 2: 5.0}

    def test_pit_lineage_roundtrip(self, spark):
        lk = FeatureLookup(
            "v", ("val",), ("k",), spine_keys=("k",),
            timestamp_lookup_key=("ts", "fts"),
        )
        spine = spark.createDataFrame([(1,)], "k long")
        ts = create_training_set(
            spark, spine.withColumn("ts", F.current_timestamp()), [lk],
            resolve_table=lambda _: spark.createDataFrame(
                [(1, None, 0.0)], "k long, fts timestamp, val double"
            ),
        )
        assert ts.lineage()["lookups"][0]["timestamp_lookup_key"] == ["ts", "fts"]

    def test_null_feature_in_latest_version_wins_atomically(self, spark):
        """When the latest eligible version legitimately holds NULL for
        one feature, the WHOLE version wins (NULL included) — per-column
        carry-forward would stitch val2 from the older version, diverging
        from ASOF semantics."""
        import datetime

        def t(s):
            return datetime.datetime(2024, 1, s)

        spine = spark.createDataFrame([(1, t(20))], "k long, ts timestamp")
        versions = spark.createDataFrame(
            [(1, t(5), 1.0, 7.0), (1, t(15), 2.0, None)],
            "k long, fts timestamp, val double, val2 double",
        )
        lk = FeatureLookup(
            "v", ("val", "val2"), ("k",), spine_keys=("k",),
            timestamp_lookup_key=("ts", "fts"),
        )
        ts_set = create_training_set(
            spark, spine, [lk], resolve_table={"v": versions}.__getitem__
        )
        row = ts_set.load_df().collect()[0]
        assert row["val"] == 2.0 and row["val2"] is None

    def test_map_typed_feature_is_carried(self, spark):
        """A map-typed feature column (unorderable — cannot appear in an
        ORDER BY) must still ride along in PIT lookups: the tiebreak
        struct silently omits it instead of failing analysis."""
        import datetime

        def t(s):
            return datetime.datetime(2024, 1, s)

        spine = spark.createDataFrame([(1, t(20))], "k long, ts timestamp")
        versions = spark.createDataFrame(
            [(1, t(5), 1.0, {"a": 1.0}), (1, t(15), 2.0, {"b": 2.0})],
            "k long, fts timestamp, val double, tags map<string,double>",
        )
        lk = FeatureLookup(
            "v", ("val", "tags"), ("k",), spine_keys=("k",),
            timestamp_lookup_key=("ts", "fts"),
        )
        ts_set = create_training_set(
            spark, spine, [lk], resolve_table={"v": versions}.__getitem__
        )
        row = ts_set.load_df().collect()[0]
        assert row["val"] == 2.0 and row["tags"] == {"b": 2.0}


class TestOnDemandFeatures:
    def test_on_demand_chains_and_survives_exclude(self, spark):
        """Later on-demand expressions may reference earlier ones, and a
        feature derived from a key that exclude_columns then drops must
        survive the drop."""
        from databricks_feature_store_poc_spark.featurestore.lookup import (
            FeatureLookup,
            create_training_set,
        )

        spine = spark.createDataFrame(
            [(1, 10, 100.0), (2, 20, 400.0)], ["id", "k", "amount"]
        )
        features = spark.createDataFrame([(10, 2.0), (20, 4.0)], ["k", "f"])
        ts = create_training_set(
            spark,
            spine,
            [FeatureLookup("t", ("f",), ("k",))],
            exclude_columns=["k"],
            resolve_table={"t": features}.__getitem__,
            on_demand_features={
                "ratio": "amount / f",          # uses looked-up column
                "ratio_sq": "ratio * ratio",    # chains on earlier on-demand
                "key_parity": "k % 2",          # uses the soon-dropped key
            },
        )
        rows = {r["id"]: r for r in ts.load_df().collect()}
        assert "k" not in ts.load_df().columns
        assert rows[1]["ratio"] == 50.0 and rows[1]["ratio_sq"] == 2500.0
        assert rows[2]["key_parity"] == 0

    def test_on_demand_name_collision_rejected(self, spark):
        from databricks_feature_store_poc_spark.featurestore.lookup import (
            FeatureLookup,
            create_training_set,
        )
        import pytest as _pytest

        spine = spark.createDataFrame([(1, 10)], ["id", "k"])
        features = spark.createDataFrame([(10, 2.0)], ["k", "f"])
        with _pytest.raises(ValueError, match="collides"):
            create_training_set(
                spark,
                spine,
                [FeatureLookup("t", ("f",), ("k",))],
                resolve_table={"t": features}.__getitem__,
                on_demand_features={"f": "f * 2"},
            )


# --- online sync: table -> KV, executor-parallel ---------------------------


def test_online_full_sync_matches_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from tests.conftest import SF_TEST

    from databricks_feature_store_poc_spark.featurestore.online import (
        OnlineStoreSync,
        SpoolDirKV,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    table = (
        load_table(spark, SF_TEST, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .filter(F.col("c_custkey") <= 300)
    )
    kv = SpoolDirKV(str(tmp_path / "kv"))
    OnlineStoreSync(kv, ["c_custkey"], batch_size=64).full_sync(table)
    rows = table.collect()
    assert len(kv.load()) == len(rows)
    for r in rows[:25]:
        assert kv.get((r["c_custkey"],)) == {
            "c_acctbal": r["c_acctbal"],
            "c_mktsegment": r["c_mktsegment"],
        }
    assert kv.get((-1,)) is None


def test_online_delta_sync_writes_only_changes(spark, tmp_path):
    from pyspark.sql import functions as F

    from tests.conftest import SF_TEST

    from databricks_feature_store_poc_spark.featurestore.online import (
        OnlineStoreSync,
        SpoolDirKV,
    )
    from databricks_feature_store_poc_spark.sources.catalog import load_table

    base = (
        load_table(spark, SF_TEST, "customer")
        .select("c_custkey", "c_acctbal")
        .filter(F.col("c_custkey") <= 200)
    )
    kv = SpoolDirKV(str(tmp_path / "kv"))
    sync = OnlineStoreSync(kv, ["c_custkey"], batch_size=64)
    sync.full_sync(base)
    n_full = kv.stats()["n_writes"]

    # new snapshot: 10 keys changed, 5 keys dropped, 3 new keys
    changed = base.filter(F.col("c_custkey") <= 10).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )
    kept = base.filter((F.col("c_custkey") > 10) & (F.col("c_custkey") <= 195))
    new = spark.createDataFrame(
        [(10_001, 1.0), (10_002, 2.0), (10_003, 3.0)], "c_custkey long, c_acctbal double"
    )
    snapshot2 = changed.unionByName(kept).unionByName(new)
    sync.delta_sync(base, snapshot2)

    stats = kv.stats()
    n_delta_writes = stats["n_writes"] - n_full
    # only changed + new keys are written, NOT the whole table
    assert n_delta_writes == changed.count() + new.count()
    assert n_delta_writes < n_full
    # dropped keys are deleted
    assert stats["n_deletes"] == base.count() - changed.count() - kept.count()

    view = kv.load()
    assert len(view) == snapshot2.count()
    for r in snapshot2.collect():
        assert view[(r["c_custkey"],)]["c_acctbal"] == r["c_acctbal"]


def test_online_delta_sync_catches_all_null_insert(spark, tmp_path):
    """ADVICE r6: a NEW key whose features are all NULL must still be
    written — value inequality alone sees eqNullSafe(NULL, NULL) = true
    against the left-join's NULL __old_* columns and drops it."""
    from databricks_feature_store_poc_spark.featurestore.online import (
        OnlineStoreSync,
        SpoolDirKV,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    kv = SpoolDirKV(str(tmp_path / "kv"))
    sync = OnlineStoreSync(kv, ["k"], batch_size=8)
    sync.full_sync(old)
    sync.delta_sync(old, new)
    view = kv.load()
    assert (3,) in view and view[(3,)] == {"v": None}
    # and unchanged keys were still NOT rewritten
    assert kv.stats()["n_writes"] == old.count() + 1


def test_redis_kv_contract_is_executor_shippable():
    """RedisKV must cross a process boundary by value: pickling carries
    connection params only, key encoding is deterministic and
    namespaced, and nothing touches the network until first use."""
    import pickle

    from databricks_feature_store_poc_spark.featurestore.online import RedisKV

    kv = RedisKV("redis://example:6379/2", namespace="ft")
    clone = pickle.loads(pickle.dumps(kv))
    assert clone.url == kv.url and clone._client is None
    k1, k2 = kv._key((42, "a")), clone._key((42, "a"))
    assert k1 == k2 and k1.startswith(b"ft\x00")
    assert kv._key((43, "a")) != k1


def test_redis_kv_live_roundtrip(tmp_path):
    """Exercises the real client only when both the redis package AND a
    reachable server exist (neither does in this sandbox)."""
    import pytest

    redis = pytest.importorskip("redis")
    from databricks_feature_store_poc_spark.featurestore.online import RedisKV

    kv = RedisKV("redis://localhost:6379/0", namespace="fs_test")
    try:
        kv._conn().ping()
    except Exception:
        pytest.skip("no reachable redis server")
    kv.mset([((1,), {"v": 1.5}), ((2,), {"v": None})])
    assert kv.get((1,)) == {"v": 1.5}
    assert kv.get((2,)) == {"v": None}
    kv.delete([(1,), (2,)])
    assert kv.get((1,)) is None
