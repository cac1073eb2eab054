"""FeatureLookup + training-set assembly: the reference's core operator (J1).

Reference parity (citations into /root/reference):
- ``FeatureLookup(table_name, feature_names, lookup_key)``:
  notebooks/02_model_training.py:72-84 (config), 02:176-180 (construction).
- ``create_training_set(df, feature_lookups, label, exclude_columns)``:
  02:231-275 (242-247). Semantics: for each lookup, the spine is enriched
  with the selected features via a *left* equi-join on the lookup key;
  unmatched spine rows keep NULL features; the spine's row count is
  preserved even when spine keys repeat (the reference's training_labels
  has 21 duplicate pairs — SURVEY.md §1.3), because feature-table PKs are
  unique. ``exclude_columns`` (02:69,246) are dropped from the final
  matrix; the label column rides along.
- ``TrainingSet.load_df()``: 02:250 — stays lazy until the caller acts.

Spark-first compilation (SURVEY.md §2 J1/P1/P2): each lookup becomes
``spine.join(broadcast(table.select(key, *features)), key, "left")``.
The explicit ``.select`` narrows the feature table *before* the join so
column pruning survives any metadata layer; ``broadcast()`` is applied when
the feature side is plausibly dimension-sized, which is the feature-store
shape (dims ≪ spine). At 100 TB spine scale the broadcast hint keeps the
plan shuffle-free on the spine side — the spine never repartitions; only
the small dim tables move. For dims too large to broadcast, pass
``broadcast=False`` and Catalyst/AQE picks sort-merge with skew handling.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FeatureLookup:
    """Declarative enrichment spec (reference 02:176-180).

    ``lookup_key`` holds the feature table's PK column(s). When the spine
    carries the key under different names, set ``spine_keys`` to the
    spine-side columns (positionally matching ``lookup_key``) — or build
    via ``FeatureLookup.of`` with a ``{spine_col: table_pk}`` dict, which
    splits it into the two fields.
    """

    table_name: str
    feature_names: tuple[str, ...]
    lookup_key: tuple[str, ...]
    # Spine columns carrying the key, when named differently from the
    # feature table's PK (the reference's spine shares names, 02:76,83).
    spine_keys: tuple[str, ...] = ()
    rename: dict = field(default_factory=dict)  # feature -> output name
    # Point-in-time lookup (the Databricks FeatureLookup
    # `timestamp_lookup_key` capability): (spine_ts_col, feature_ts_col).
    # When set, each spine row receives the LATEST feature version with
    # feature_ts <= spine_ts — no label leakage from future features.
    timestamp_lookup_key: tuple[str, str] | None = None

    @staticmethod
    def of(table_name: str, feature_names: list[str], lookup_key) -> "FeatureLookup":
        """Accepts a shared key name, a list of names, or a
        {spine_col: table_pk} dict (split into spine_keys/lookup_key)."""
        if isinstance(lookup_key, dict):
            spine_keys = tuple(lookup_key.keys())
            keys = tuple(lookup_key.values())
            return FeatureLookup(
                table_name, tuple(feature_names), keys, spine_keys=spine_keys
            )
        keys = (lookup_key,) if isinstance(lookup_key, str) else tuple(lookup_key)
        return FeatureLookup(table_name, tuple(feature_names), keys)


class TrainingSet:
    """Lazy spine ⋈ lookups composition (reference 02:242-250)."""

    def __init__(
        self,
        df: DataFrame,
        lookups: list[FeatureLookup],
        label: str | None,
        exclude_columns: list[str],
        on_demand_features: dict[str, str] | None = None,
    ):
        self._df = df
        self.lookups = lookups
        self.label = label
        self.exclude_columns = exclude_columns
        self.on_demand_features = dict(on_demand_features or {})

    def load_df(
        self, sample_fraction: float | None = None, seed: int = 42
    ) -> DataFrame:
        """Return the lazy training DataFrame (materialize with an action).

        ``sample_fraction`` mitigates the reference's `toPandas` cliff
        (02:250; SURVEY §7): at 100 TB you never materialize the full
        matrix driver-side — sample for exploration/driver-side training,
        or keep the full DataFrame distributed (train_gbt)."""
        if sample_fraction is not None:
            return self._df.sample(fraction=sample_fraction, seed=seed)
        return self._df

    def lineage(self) -> dict:
        """JSON-serializable lookup lineage, persisted by ``log_model`` so
        scoring can replay the same joins (reference ML3, 02:478-484)."""
        return {
            "lookups": [
                {
                    "table_name": lk.table_name,
                    "feature_names": list(lk.feature_names),
                    "lookup_key": list(lk.lookup_key),
                    # spine_keys must survive the round-trip or score_batch
                    # replays the join with the wrong spine columns.
                    "spine_keys": list(lk.spine_keys),
                    "rename": dict(lk.rename),
                    "timestamp_lookup_key": list(lk.timestamp_lookup_key)
                    if lk.timestamp_lookup_key else None,
                }
                for lk in self.lookups
            ],
            "label": self.label,
            "exclude_columns": list(self.exclude_columns),
            # Serve-side replay must recompute on-demand features with
            # the exact training expressions — the consistency guarantee.
            "on_demand_features": dict(self.on_demand_features),
        }


def apply_lookup(
    spine: DataFrame,
    feature_table: DataFrame,
    lookup: FeatureLookup,
    *,
    use_broadcast: bool = True,
) -> DataFrame:
    """Compile one FeatureLookup into a projected left equi-join.

    When ``spine_keys`` is set, the spine carries the key under different
    names than the feature table's PK (e.g. ``o_custkey`` -> ``c_custkey``);
    the join condition equates them positionally and only the spine's copy
    survives — the reference's output has exactly spine columns + selected
    features.
    """
    keys = list(lookup.lookup_key)
    skeys = list(lookup.spine_keys) if lookup.spine_keys else keys
    if len(skeys) != len(keys):
        raise ValueError(f"spine_keys {skeys} != lookup_key {keys} arity")
    feats = [f for f in lookup.feature_names if f not in keys]
    # Feature names that already exist on the spine would produce ambiguous
    # duplicate columns after the join (and withColumnRenamed would rename
    # the wrong copy) — fail fast with the fix spelled out.
    collisions = [
        f for f in feats
        if f in spine.columns and lookup.rename.get(f, f) == f
    ]
    if collisions:
        raise ValueError(
            f"feature column(s) {collisions} from {lookup.table_name!r} "
            f"collide with spine columns; set rename={{...}} on the "
            "FeatureLookup to give them distinct output names"
        )
    if lookup.timestamp_lookup_key is not None:
        return _apply_point_in_time_lookup(spine, feature_table, lookup, skeys, keys, feats)
    # Renames are applied via alias on the narrowed side BEFORE the join:
    # a post-join withColumnRenamed would hit the first of two same-named
    # columns ambiguously when a feature collides with a spine column.
    narrowed = feature_table.select(
        *keys,
        *[F.col(f).alias(lookup.rename.get(f, f)) for f in feats],
    )
    if use_broadcast:
        narrowed = F.broadcast(narrowed)
    if skeys == keys:
        out = spine.join(narrowed, on=keys, how="left")
    else:
        cond = None
        for sk, fk in zip(skeys, keys):
            c = spine[sk] == narrowed[fk]
            cond = c if cond is None else (cond & c)
        out = spine.join(narrowed, on=cond, how="left").drop(*[
            narrowed[fk] for fk in keys
        ])
    return out


def orderable_type(dt) -> bool:
    """Whether a Spark type can appear in a window/sort ORDER BY.

    Maps are not orderable; arrays/structs are orderable iff their element/
    field types are. Used to build deterministic tiebreaks that silently
    omit unorderable columns instead of failing analysis for schemas
    carrying map-typed features.
    """
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return orderable_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(orderable_type(f.dataType) for f in dt.fields)
    return True


def _apply_point_in_time_lookup(
    spine: DataFrame,
    feature_table: DataFrame,
    lookup: FeatureLookup,
    skeys: list[str],
    keys: list[str],
    feats: list[str],
) -> DataFrame:
    """Point-in-time enrichment: latest feature version at or before each
    spine row's timestamp (the feature-store answer to label leakage).

    Scale-correct plan — the union + running-carry-forward formulation:
    tag both relations, union them, ONE window per key ordered by
    (event time, side) carrying the last non-null feature value forward,
    keep the spine rows. Cost: one shuffle on the key, linear in
    |spine| + |versions| — never a per-row range probe or a versions
    blow-up join. Feature rows sort before spine rows at equal timestamps,
    so a version AT the spine time is visible (ts >= version_ts,
    inclusive), matching DuckDB/ASOF semantics (the oracle of
    training_set_point_in_time).

    The carried value is ONE struct of all feature columns, not per-column
    lasts: the whole latest version wins atomically, NULL fields included
    (per-column ``last(ignorenulls)`` would stitch different versions
    together whenever the latest version holds a legitimate NULL —
    diverging from ASOF semantics). Versions tying on (key, feature_ts)
    get a deterministic winner via a tiebreak struct of the ORDERABLE
    feature columns (max wins); map-typed features ride in the value
    struct but stay out of the tiebreak — maps cannot appear in an ORDER
    BY, and versions identical on every orderable column are
    indistinguishable anyway.

    NULL-key contract (r11): a NULL lookup key matches NOTHING, exactly
    like the equi-join it replaces (and DuckDB's ASOF JOIN). NULL-key
    feature versions are dropped before the union and NULL-key spine
    rows get NULL features after the fill — without both masks the
    window's NULL partition would happily carry versions forward across
    keyless rows, a divergence the adversarial replica exposed.
    """
    from pyspark.sql.window import Window

    spine_ts, feat_ts = lookup.timestamp_lookup_key
    out_names = [lookup.rename.get(f, f) for f in feats]
    tie_feats = [
        f for f in feats if orderable_type(feature_table.schema[f].dataType)
    ]
    keys_not_null = None
    for k in keys:
        c = F.col(k).isNotNull()
        keys_not_null = c if keys_not_null is None else keys_not_null & c
    narrowed = feature_table.filter(keys_not_null).select(
        *[F.col(k).alias(sk) for k, sk in zip(keys, skeys)],
        F.col(feat_ts).alias("__pit_ts"),
        F.struct(
            *[F.col(f).alias(lookup.rename.get(f, f)) for f in feats]
        ).alias("__pit_feat"),
        *([F.struct(*tie_feats).alias("__pit_tie")] if tie_feats else []),
    ).withColumn("__side", F.lit(0))
    spine_tagged = spine.withColumn("__pit_ts", F.col(spine_ts)).withColumn(
        "__side", F.lit(1)
    )
    unioned = spine_tagged.unionByName(narrowed, allowMissingColumns=True)
    order_cols = ["__pit_ts", "__side"] + (["__pit_tie"] if tie_feats else [])
    w = (
        Window.partitionBy(*skeys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [
        c
        for c in unioned.columns
        if c not in ("__side", "__pit_ts", "__pit_feat", "__pit_tie", *out_names)
    ]
    filled = unioned.select(
        *keep,
        "__side",
        F.last("__pit_feat", ignorenulls=True).over(w).alias("__pit_feat"),
    )
    skeys_not_null = None
    for sk in skeys:
        c = F.col(sk).isNotNull()
        skeys_not_null = c if skeys_not_null is None else skeys_not_null & c
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *keep,
            *[
                F.when(skeys_not_null, F.col("__pit_feat").getField(f))
                .alias(f)
                for f in out_names
            ],
        )
    )


def create_training_set(
    spark: SparkSession,
    spine: DataFrame,
    feature_lookups: list[FeatureLookup],
    label: str | None = None,
    exclude_columns: list[str] | None = None,
    *,
    resolve_table=None,
    use_broadcast: bool = True,
    on_demand_features: dict[str, str] | None = None,
) -> TrainingSet:
    """Reference ``fs.create_training_set`` (02:242-247), lazily compiled.

    ``resolve_table`` maps a lookup's table_name to a DataFrame; defaults to
    ``spark.table`` (registered feature tables).

    ``on_demand_features`` maps new column names to SQL expressions
    computed AT LOOKUP TIME over spine + looked-up columns (the
    feature-store "on-demand feature" concept: features derived from
    request context that can't be precomputed into any table). They are
    appended after all lookups, inside the same Catalyst plan — zero
    extra passes, and train/serve use the identical expression (the
    consistency guarantee that makes on-demand features safe). Applied
    in dict order, so later expressions may reference earlier ones;
    applied BEFORE exclude_columns, so a feature may be derived from a
    key that is then dropped."""
    exclude_columns = exclude_columns or []
    if label is not None and label not in spine.columns:
        raise ValueError(f"label column {label!r} not in spine {spine.columns}")
    resolve = resolve_table or spark.table
    df = spine
    for lk in feature_lookups:
        df = apply_lookup(df, resolve(lk.table_name), lk, use_broadcast=use_broadcast)
    for name, expr in (on_demand_features or {}).items():
        if name in df.columns:
            raise ValueError(
                f"on-demand feature {name!r} collides with an existing column"
            )
        df = df.withColumn(name, F.expr(expr))
    if exclude_columns:
        df = df.drop(*[c for c in exclude_columns if c in df.columns])
    return TrainingSet(
        df, feature_lookups, label, exclude_columns, on_demand_features
    )
