"""Skew-mitigation utilities: salted joins for pathological hot keys.

First resort is AQE's skew-join splitting (pinned on in session.py) — it
splits oversized shuffle partitions at runtime with no code change. A
salted join is the manual fallback for the cases AQE can't fix: a single
key so hot that even a split partition's *build side* row group is too
large, or a broadcast-ineligible dimension joined on a power-law key.

Mechanics: the fact side scatters each row into one of ``n_salts``
sub-keys via a deterministic hash of the whole row; the dimension side is
replicated ``n_salts`` times (explode over a literal range — cheap, dims
are small relative to facts). Joining on (key, salt) spreads the hot
key's rows over n_salts reducers. Result is row-identical to the unsalted
join because every fact row still meets every matching dim row exactly
once (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``n_salts`` ways.

    ``how`` supports 'inner' and 'left' (fact-preserving). The dim side
    must be unique on ``on`` — the usual dimension contract — otherwise
    replication would double-count.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_salted = fact.withColumn("__salt", salt)
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_salted.join(dim_salted, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
