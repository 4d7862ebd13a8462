"""One-off refresh-vs-full-rebuild measurement at scale (round 5).

bench.py's sf0.1 refresh probe answers "does the refresh path work and
what does it cost on the driver box" — but at 1M turns the full
Stage-A rebuild itself is ~6 s, which is BELOW the refresh path's
fixed floor (frontier read, change-detection aggregate over the
current turns snapshot, two partition-pruned upserts: ~10 Spark jobs
of scheduling overhead).  The ratio a real user cares about only
emerges when rebuild cost >> job overhead, i.e. at scale.

This script measures both on the cached 29.3M-turn scaling corpus
(9M conversations, /tmp/bench_kg_corpus_9000000 from
scripts/bench_scaling.py) at local[32]:

  * full rebuild  = extract_triples over all turns + bucketed write
    (the exact work a refresh replaces)
  * sparse refresh = ~9 conversations gain one turn (the
    RecentChanges-shaped steady state), via refresh_triples_partitioned
  * 1%% refresh    = ~90k conversations gain one turn (the degradation
    bound: the delta hashes into every bucket, upsert ≈ full rewrite)

The first refresh also pays the one-time frontier bootstrap (full
triples scan + full frontier write) and is reported separately.

Prints one ``REFRESH_SCALE_RESULT {...}`` JSON line; each phase's raw
wall is printed as it lands so a killed run still yields data.
Results are recorded in BENCH/BASELINE.md, not BENCH_r*.json (the
driver bench stays timeboxed at sf0.1).
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
from lexicator_spark.operators.incremental import refresh_triples_partitioned
from lexicator_spark.session import get_spark
from lexicator_spark.sources import io as sio

CORPUS = "/tmp/bench_kg_corpus_9000000"
ROOT = "/tmp/bench_refresh_scale"
STAGE = os.path.join(ROOT, "triples_raw")


def main() -> None:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {CORPUS} (generate via bench_scaling.py)")
    shutil.rmtree(ROOT, ignore_errors=True)

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      app_name="refresh_scale")
    turns = spark.read.parquet(CORPUS)
    n_turns = turns.count()
    out: dict = {"n_turns": n_turns}

    # ── full Stage-A rebuild: the work refresh replaces ────────────
    t0 = time.monotonic()
    good, _ = split_rejects(extract_triples(turns))
    sio.write_table(good, STAGE, partition_key="conv_id")
    out["full_rebuild_s"] = round(time.monotonic() - t0, 2)
    print(f"PHASE full_rebuild {out['full_rebuild_s']}s", flush=True)

    # deltas: the last turn of selected conversations gains one turn
    # (computed OUTSIDE timing; a real deployment reads a change feed)
    last_turns = (
        turns.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))),
        )
        .filter("rn = 1")
        .drop("rn")
        .localCheckpoint(eager=True)
    )

    def delta(modulus: int, residue: int):
        return last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(modulus)) == residue
        ).withColumn("turn_idx", F.col("turn_idx") + 1)

    turns_now = turns

    # ── refresh 1: sparse delta + one-time frontier bootstrap ──────
    turns_now = turns_now.unionByName(delta(1_000_000, 2)).localCheckpoint(eager=True)
    t0 = time.monotonic()
    res = refresh_triples_partitioned(spark, turns_now, STAGE)
    out["refresh_bootstrap_s"] = round(time.monotonic() - t0, 2)
    out["refresh_bootstrap_meta"] = [res.n_changed, res.n_buckets_touched]
    print(f"PHASE refresh_bootstrap {out['refresh_bootstrap_s']}s "
          f"changed={res.n_changed} buckets={res.n_buckets_touched}", flush=True)

    # ── refresh 2+3: sparse steady state (min-of-2, disjoint deltas) ─
    walls, meta = [], None
    for residue in (3, 4):
        turns_now = turns_now.unionByName(
            delta(1_000_000, residue)
        ).localCheckpoint(eager=True)
        t0 = time.monotonic()
        res = refresh_triples_partitioned(spark, turns_now, STAGE)
        walls.append(round(time.monotonic() - t0, 2))
        meta = [res.n_changed, res.n_buckets_touched]
        print(f"PHASE refresh_sparse {walls[-1]}s "
              f"changed={res.n_changed} buckets={res.n_buckets_touched}", flush=True)
    out["refresh_sparse_s"] = min(walls)
    out["refresh_sparse_meta"] = meta
    out["sparse_vs_full_ratio"] = round(out["full_rebuild_s"] / out["refresh_sparse_s"], 1)

    # ── refresh 4: 1% scattered delta (degradation bound) ──────────
    turns_now = turns_now.unionByName(delta(100, 5)).localCheckpoint(eager=True)
    t0 = time.monotonic()
    res = refresh_triples_partitioned(spark, turns_now, STAGE)
    out["refresh_1pct_s"] = round(time.monotonic() - t0, 2)
    out["refresh_1pct_meta"] = [res.n_changed, res.n_buckets_touched]
    out["pct1_vs_full_ratio"] = round(out["full_rebuild_s"] / out["refresh_1pct_s"], 1)
    print(f"PHASE refresh_1pct {out['refresh_1pct_s']}s "
          f"changed={res.n_changed} buckets={res.n_buckets_touched}", flush=True)

    print("REFRESH_SCALE_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
