"""Explicit skew handling: salted keys for hot entities (north_rule:
"AQE + salt keys for hot entities like frequent tool names").

AQE's skew-join splitter handles storage skew at runtime; salting is
for *key* skew in aggregations and joins where one key (the hot tool,
the viral conversation) would otherwise serialize into a single task.

- ``with_salt``: composite key ``(key, pmod(xxhash64(stable_col), n))``
  — deterministic (no rand(): reruns and retries must land rows in
  the same salt bucket for checkpoint idempotency).
- ``salted_agg``: two-phase aggregation — partial agg on the salted
  key, final agg on the true key.  The classic map-side-combine
  pattern made explicit for algebraic aggregates.
- ``replicate_for_salt``: explode a small dimension n ways so a
  salted fact side still joins (dedup afterwards by output key —
  SURVEY.md §7 hard-part (d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, stable_col: str, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from a high-card
    column (e.g. conv_id), NOT from rand()."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(stable_col)), F.lit(n_salts)).cast("int")
    )


def salted_count(
    df: DataFrame, key: str, stable_col: str, n_salts: int = 16
) -> DataFrame:
    """count(*) per key via two-phase salted aggregation: shuffle 1 on
    (key, salt) spreads the hot key over n_salts tasks, shuffle 2
    combines n_salts partials per key."""
    partial = (
        with_salt(df, stable_col, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))


def replicate_for_salt(dim: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate every dimension row once per salt value so it can
    equi-join a fact side salted with ``with_salt`` on
    (key, salt_col).  Join output must be deduped by its natural key
    if the dimension is not unique per join key."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))
