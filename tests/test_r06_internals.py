"""Focused tests for the r6 optimization changes to operator
internals: upsert_partitions' returned bucket counts (now load-bearing
for refresh lineage upkeep) and the union-aggregate change detection
in refresh_triples_partitioned (replacing the aggregate+join shape).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lexicator_spark.sources import io as sio


@pytest.fixture(scope="module")
def spark():
    from lexicator_spark.session import get_spark

    return get_spark(master="local[4]", app_name="r06_internals", shuffle_partitions=4)


def _turns(spark, rows):
    from lexicator_spark import synth

    return synth.corpus_df(spark, synth.Corpus(rows=rows))


def test_upsert_returns_exact_bucket_counts(spark, tmp_path):
    """The became-empty probe's counts (consumed by plans/refresh's
    _delta_bucket_counts instead of a re-read) must equal a ground-
    truth recount of the written buckets, and an intentionally
    emptied touched bucket must be absent from them AND deleted."""
    loc = str(tmp_path / "t")
    df = spark.range(200).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id").alias("v"),
    )
    sio.write_table(df, loc, partition_key="conv_id", n_buckets=8)
    truth = {
        int(r["p_hash"]): int(r["count"])
        for r in sio.read_table(spark, loc, keep_bucket_col=True)
        .groupBy("p_hash")
        .count()
        .collect()
    }
    # replacement: bucket b_keep gets its rows doubled in v (same
    # rows, new payload), bucket b_empty is emptied
    buckets = sorted(truth)
    b_keep, b_empty = buckets[0], buckets[1]
    hashed = sio.read_table(spark, loc, keep_bucket_col=True)
    repl = (
        hashed.filter(F.col("p_hash") == b_keep)
        .drop("p_hash")
        .withColumn("v", F.col("v") * 2)
    )
    counts = sio.upsert_partitions(
        repl, loc, partition_key="conv_id", n_buckets=8,
        touched_buckets=[b_keep, b_empty],
    )
    assert counts == [(b_keep, truth[b_keep])]
    assert not os.path.exists(os.path.join(loc, f"p_hash={b_empty}"))
    # untouched buckets intact, per-bucket recount matches the return
    after = {
        int(r["p_hash"]): int(r["count"])
        for r in sio.read_table(spark, loc, keep_bucket_col=True)
        .groupBy("p_hash")
        .count()
        .collect()
    }
    expected = {b: c for b, c in truth.items() if b != b_empty}
    assert after == expected


def test_upsert_without_touched_buckets_returns_none(spark, tmp_path):
    loc = str(tmp_path / "t2")
    df = spark.range(10).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        F.col("id").alias("v"),
    )
    sio.write_table(df, loc, partition_key="conv_id", n_buckets=4)
    assert (
        sio.upsert_partitions(df, loc, partition_key="conv_id", n_buckets=4)
        is None
    )


def test_detection_union_agg_equivalence(spark, tmp_path):
    """The one-exchange union-aggregate detection must reproduce the
    aggregate+join semantics exactly, including the edges: a
    conversation present only in the FRONTIER (removed from the
    snapshot) is NOT changed; a new conversation (no frontier row) IS;
    a conversation whose max advanced IS; an unchanged one is NOT."""
    from datetime import datetime

    from lexicator_spark.operators.incremental import (
        materialize_frontier,
        refresh_triples_partitioned,
    )
    from lexicator_spark.operators.extract import extract_triples, split_rejects

    ts = datetime(2024, 1, 1)
    base_rows = [
        ("keep", 0, "user", "hello Spark SQL", None, ts),
        ("keep", 1, "assistant", "hi", None, ts),
        ("grow", 0, "user", "uses vector index", None, ts),
        ("gone", 0, "user", "mentions Flink", None, ts),
    ]
    turns0 = _turns(spark, base_rows)
    loc = str(tmp_path / "stage")
    good, _ = split_rejects(extract_triples(turns0))
    sio.write_table(good, loc, partition_key="conv_id", n_buckets=4)
    materialize_frontier(spark, turns0, loc, n_buckets=4)

    # new snapshot: 'gone' removed, 'grow' gained a turn, 'new' added
    turns1 = _turns(
        spark,
        [
            ("keep", 0, "user", "hello Spark SQL", None, ts),
            ("keep", 1, "assistant", "hi", None, ts),
            ("grow", 0, "user", "uses vector index", None, ts),
            ("grow", 1, "user", "and Spark too", None, ts),
            ("new", 0, "user", "fresh conversation about Spark", None, ts),
        ],
    )
    res = refresh_triples_partitioned(spark, turns1, loc)
    # detection mode: changed = advanced or new, NEVER frontier-only
    assert res.n_changed == 2
    convs = {
        r.conv_id
        for r in res.table.select("conv_id").distinct().collect()
        if r.conv_id is not None
    }
    # 'gone' keeps its triples (detection cannot see deletions —
    # documented; feed mode handles removals), 'new'/'grow' current
    assert {"keep", "grow", "new", "gone"} <= convs
    # the refreshed table equals a full re-extraction of the union of
    # surviving frontier state: grow has turn 1's triples now
    grow_triples = res.table.filter(
        (F.col("conv_id") == "grow") & (F.col("turn_idx") == 1)
    ).count()
    assert grow_triples > 0
    # frontier advanced for changed convs only; second refresh of the
    # SAME snapshot is a no-op (the invariant the union-agg must keep)
    res2 = refresh_triples_partitioned(spark, turns1, loc)
    assert res2.n_changed == 0
