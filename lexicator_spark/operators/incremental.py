"""Incremental view maintenance: process only new/changed
conversations — the Spark re-design of lexicator's RecentChanges
delta refresh (SURVEY.md §2 #2, ``ContentStore.refresh`` /
``find_recent_changes`` [M]).

Batch form (parquet backend): the processed frontier is the per-conv
max ``(turn_idx)`` already present in the stage table; new work =
turns beyond the frontier, PLUS every turn of any conversation that
gained turns (the extraction window and ``replies_to`` need the whole
conversation — re-deriving a conversation is idempotent because stage
writes are keyed dedups).  With Iceberg the frontier bookkeeping is
replaced by incremental snapshot reads — same function shape.

Scale: the frontier aggregate is one shuffle over (conv_id); the
anti/semi joins run on conv_id — co-partitioned with the stage
tables' salted-hash layout, so at 10^12 turns the delta path touches
only buckets containing changed conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexicator_spark.operators.extract import extract_triples


def changed_conversations(turns: DataFrame, done_triples: DataFrame) -> DataFrame:
    """conv_ids that are new or have turns beyond the processed
    frontier recorded in the stage table.

    Caveat: a conversation whose turns produced zero triples has no
    frontier row and re-derives on every refresh (a no-op — extraction
    is deterministic).  If that tail matters at scale, persist an
    explicit ``_frontier(conv_id, max_turn_idx)`` table instead; the
    join shape below is unchanged."""
    frontier = done_triples.groupBy("conv_id").agg(
        F.max("turn_idx").alias("done_max_idx")
    )
    latest = turns.groupBy("conv_id").agg(F.max("turn_idx").alias("max_idx"))
    return (
        latest.join(frontier, "conv_id", "left")
        .filter(
            F.col("done_max_idx").isNull()
            | (F.col("max_idx") > F.col("done_max_idx"))
        )
        .select("conv_id")
    )


def extract_incremental(
    turns: DataFrame, done_triples: DataFrame, impl: str = "native"
) -> DataFrame:
    """Triples for new/changed conversations only.  Union the result
    with the untouched part of the stage table (or MERGE under
    Iceberg) to refresh the stage."""
    changed = changed_conversations(turns, done_triples)
    delta_turns = turns.join(F.broadcast(changed), "conv_id", "left_semi")
    return extract_triples(delta_turns, impl=impl)


def refresh_triples(
    turns: DataFrame, done_triples: DataFrame, impl: str = "native"
) -> DataFrame:
    """Full refreshed stage table: untouched conversations' existing
    triples + re-derived triples for changed conversations."""
    changed = changed_conversations(turns, done_triples)
    kept = done_triples.join(F.broadcast(changed), "conv_id", "left_anti")
    # same_as/canonical rows carry conv_id NULL — they are global and
    # always recomputed downstream, never kept here
    kept = kept.filter(F.col("conv_id").isNotNull())
    return kept.unionByName(extract_incremental(turns, done_triples, impl=impl))
