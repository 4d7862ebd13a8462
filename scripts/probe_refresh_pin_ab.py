"""Interleaved A/B probe: double-pin vs single-pin refresh (round 5).

The round-5 review removed the caller-side eager ``localCheckpoint``
of the refresh replacement frames (``operators/incremental.py``,
"Refresh double-materialization removed" in BENCH/BASELINE.md) —
``sio.upsert_partitions`` already pins one evaluation internally
whenever ``touched_buckets`` is passed, so the refresh staged its
dominant intermediate twice.  bench.py evidence for the win is
cross-session (the box degraded ~30% between the runs; the refresh
rows still moved DOWN against that tide), so this probe converts the
claim into a same-JVM measurement, the method VERDICT r4 endorsed for
``kg_pipeline_materialized``.

Design: one session on the cached 3M-conversation corpus
(:= ~9.76M turns, ``/tmp/bench_kg_corpus_3000000`` from
scripts/bench_scaling.py).  Stage-A build + build-time frontier once
(untimed), then steady-state feed-mode refreshes with DISJOINT
residues, alternating arms in ABBA order so the documented same-JVM
wall climb (BENCH/BASELINE.md "refresh-row ordering drift": later
invocations run ~45% slower regardless of mode) cancels to first
order:

  * arm OLD — ``sio.upsert_partitions`` wrapped to eagerly pin its
    input first, recreating the removed caller-side checkpoint at the
    same point in the plan (the internal pin then fires on the
    already-pinned frame, exactly the shipped r5 double cost);
  * arm NEW — shipped code, one pin per sink.

Sparse (~10 convs, the RecentChanges steady state) runs 4+4; the 1%
scattered delta (the degradation bound, where the staged volume and
therefore the removed second materialization is largest) runs 2+2.

Prints one ``REFRESH_PIN_AB_RESULT {...}`` JSON line; per-phase walls
print as they land so a killed run still yields data.  Results go to
BENCH/BASELINE.md, not BENCH_r*.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.operators.incremental import (
    materialize_frontier,
    refresh_triples_partitioned,
)
from lexicator_spark.session import get_spark
from lexicator_spark.sources import io as sio

CORPUS = os.environ.get("PIN_AB_CORPUS", "/tmp/bench_kg_corpus_3000000")
ROOT = "/tmp/bench_refresh_pin_ab"
STAGE = os.path.join(ROOT, "triples_raw")
LAST = os.path.join(ROOT, "last_turns")
DELTAS = os.path.join(ROOT, "deltas")

_SINGLE_PIN_UPSERT = sio.upsert_partitions


def _double_pin_upsert(df, *args, **kwargs):
    # the removed caller-side pin, reinstated at the seam: eagerly
    # materialize the replacement, then hand it to the shipped upsert
    # (whose internal touched_buckets pin fires again) — byte-for-byte
    # the r5 pre-fix cost profile
    return _SINGLE_PIN_UPSERT(df.localCheckpoint(eager=True), *args, **kwargs)


def main() -> None:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {CORPUS} (generate via bench_scaling.py)")
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(DELTAS)

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      app_name="refresh_pin_ab")
    turns = spark.read.parquet(CORPUS)
    out: dict = {"n_turns": turns.count(), "corpus": CORPUS}

    t0 = time.monotonic()
    good, _ = split_rejects(extract_triples(turns))
    sio.write_table(good, STAGE, partition_key="conv_id")
    materialize_frontier(spark, turns, STAGE)
    out["build_s"] = round(time.monotonic() - t0, 2)
    print(f"PHASE build+frontier {out['build_s']}s", flush=True)

    (
        turns.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))),
        )
        .filter("rn = 1")
        .drop("rn")
        .write.parquet(LAST)
    )
    last_turns = spark.read.parquet(LAST)

    n_deltas = 0

    def add_delta(modulus: int, residue: int) -> None:
        nonlocal n_deltas
        (
            last_turns.filter(
                F.pmod(F.xxhash64("conv_id"), F.lit(modulus)) == residue
            )
            .withColumn("turn_idx", F.col("turn_idx") + 1)
            .write.parquet(os.path.join(DELTAS, f"d{n_deltas}"))
        )
        n_deltas += 1

    def turns_now():
        return turns.unionByName(spark.read.parquet(os.path.join(DELTAS, "d*")))

    walls: dict[str, list] = {}

    def refresh_once(arm: str, family: str, modulus: int, residue: int) -> None:
        add_delta(modulus, residue)
        feed = (
            spark.read.parquet(os.path.join(DELTAS, f"d{n_deltas - 1}"))
            .select("conv_id").distinct()
        )
        now = turns_now()
        sio.upsert_partitions = (
            _double_pin_upsert if arm == "old" else _SINGLE_PIN_UPSERT
        )
        try:
            t0 = time.monotonic()
            res = refresh_triples_partitioned(spark, now, STAGE, change_feed=feed)
            wall = round(time.monotonic() - t0, 2)
        finally:
            sio.upsert_partitions = _SINGLE_PIN_UPSERT
        walls.setdefault(f"{family}_{arm}", []).append(wall)
        print(f"PHASE {family} arm={arm} {wall}s changed={res.n_changed} "
              f"buckets={res.n_buckets_touched}", flush=True)

    # sparse steady state: ~10 convs per delta at 3M convs, ABBA ×2
    residue = iter(range(3, 100))
    for arm in ("old", "new", "new", "old", "old", "new", "new", "old"):
        refresh_once(arm, "sparse_feed", 300_000, next(residue))

    # 1% scattered delta: ABBA
    for arm in ("old", "new", "new", "old"):
        refresh_once(arm, "pct1_feed", 100, next(residue))

    # fully-pruned loop (refresh_from_feed): bucketed raw table, both
    # the raw read and the stage read prune to the fed buckets — the
    # O(corpus) scan is gone, so staged volume IS the wall and the
    # second pin should be its largest relative share.  Deltas come
    # from base-corpus conversations never bumped above (fresh
    # residues), upserted into the raw table before the timed refresh.
    from lexicator_spark.operators.incremental import refresh_from_feed

    RAW = os.path.join(ROOT, "turns_bucketed")
    sio.write_table(turns, RAW, partition_key="conv_id")
    print("PHASE raw_staged", flush=True)

    def pruned_once(arm: str, residue: int) -> None:
        add_delta(300_000, residue)
        delta_df = spark.read.parquet(os.path.join(DELTAS, f"d{n_deltas - 1}"))
        feed = delta_df.select("conv_id").distinct().localCheckpoint(eager=True)
        t_touched = [
            r.p
            for r in feed.select(
                F.pmod(F.xxhash64("conv_id"), F.lit(sio.DEFAULT_BUCKETS))
                .cast("int").alias("p")
            ).distinct().collect()
        ]
        pruned_existing = (
            sio.read_table(spark, RAW, keep_bucket_col=True)
            .filter(F.col("p_hash").isin(t_touched))
            .drop("p_hash")
        )
        sio.upsert_partitions(  # untimed ingest, always shipped code
            pruned_existing.unionByName(delta_df), RAW,
            partition_key="conv_id", touched_buckets=t_touched,
        )
        sio.upsert_partitions = (
            _double_pin_upsert if arm == "old" else _SINGLE_PIN_UPSERT
        )
        try:
            t0 = time.monotonic()
            res = refresh_from_feed(spark, RAW, STAGE, feed)
            wall = round(time.monotonic() - t0, 2)
        finally:
            sio.upsert_partitions = _SINGLE_PIN_UPSERT
        walls.setdefault(f"pruned_feed_{arm}", []).append(wall)
        print(f"PHASE pruned_feed arm={arm} {wall}s changed={res.n_changed} "
              f"buckets={res.n_buckets_touched}", flush=True)

    for arm in ("old", "new", "new", "old", "old", "new", "new", "old"):
        pruned_once(arm, next(residue))

    for family in ("sparse_feed", "pct1_feed", "pruned_feed"):
        o, n = walls[f"{family}_old"], walls[f"{family}_new"]
        out[f"{family}_old_walls"] = o
        out[f"{family}_new_walls"] = n
        out[f"{family}_old_min"] = min(o)
        out[f"{family}_new_min"] = min(n)
        out[f"{family}_speedup_min"] = round(min(o) / min(n), 2)
        out[f"{family}_speedup_mean"] = round(
            (sum(o) / len(o)) / (sum(n) / len(n)), 2
        )

    print("REFRESH_PIN_AB_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
