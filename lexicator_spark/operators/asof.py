"""As-of join (nearest prior event) and sessionization — operators
Spark lacks natively, composed from built-ins (SURVEY.md §2.2).

As-of join via the union+window trick: tag both sides, union, and
take ``last(right_value, ignorenulls)`` over a rows-unbounded-
preceding window per key ordered by (ts, side).  One shuffle on
(key), no range explosion — at 100 TB this beats any interval-join
rewrite because the window is a single sort within partitions.

Sessionization via lag + cumulative gap-count — the standard batch
formulation; the streaming twin is ``session_window`` (see
streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value: str,
    alias: str = "asof_value",
) -> DataFrame:
    """For each left row: the most recent right row with
    right.on <= left.on within the same ``by`` group.  Right rows at
    the exact same timestamp count as 'prior' (side ordering puts the
    right row first)."""
    l = left.withColumn("_side", F.lit(1)).withColumn("_rv", F.lit(None).cast(
        right.schema[right_value].dataType
    ))
    r = (
        right.select(by, on, F.col(right_value).alias("_rv"))
        .withColumn("_side", F.lit(0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(alias, F.last("_rv", ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side", "_rv")


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session_id per (by): a new session starts when the gap
    to the previous event exceeds gap_minutes.  session_id =
    '<by>#<n>' with n counting sessions per key from 0."""
    w = Window.partitionBy(by).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    prev_epoch = F.lag(epoch_us).over(w)
    new_session = F.when(
        prev_epoch.isNull() | (epoch_us - prev_epoch > gap_s * 1_000_000), 1
    ).otherwise(0)
    sess_n = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ) - 1
    return events.withColumn(
        "session_id",
        F.concat_ws("#", F.col(by).cast("string"), sess_n.cast("string")),
    )
