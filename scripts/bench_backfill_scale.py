"""Chunked-backfill cost at scale: what does sub-stage resumability
cost vs the one-shot Stage-A build?

Runs on the cached 29.3M-turn scaling corpus (9M conversations,
/tmp/bench_kg_corpus_9000000 from scripts/bench_scaling.py) at
local[32]:

  * full one-shot rebuild = extract_triples over all turns + one
    bucketed write (what run_pipeline's stage_a does)
  * chunked backfill      = backfill_triples over the same turns
    staged as a bucketed raw table (the pruned path), n_groups=8 —
    per-group walls printed as they land, so a killed run still
    yields data AND demonstrates the resume granularity

The delta is the price of crash-resumability: G bucket-aligned
upsert passes (each also maintaining _frontier + the error channel)
instead of one job.  Prints one ``BACKFILL_SCALE_RESULT {...}`` JSON
line; recorded in BENCH/BASELINE.md (one-off at-scale measurement,
not a per-round BENCH_r*.json row).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.operators.incremental import backfill_triples
from lexicator_spark.session import get_spark
from lexicator_spark.sources import io as sio

CORPUS = os.environ.get("BACKFILL_SCALE_CORPUS", "/tmp/bench_kg_corpus_9000000")
ROOT = "/tmp/bench_backfill_scale"
RAW = os.path.join(ROOT, "turns_bucketed")
STAGE_FULL = os.path.join(ROOT, "stage_full")
STAGE_BF = os.path.join(ROOT, "stage_backfill")
N_GROUPS = int(os.environ.get("BACKFILL_SCALE_GROUPS", "8"))


def main() -> None:
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {CORPUS} (generate via bench_scaling.py)")
    shutil.rmtree(ROOT, ignore_errors=True)

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      app_name="backfill_scale")
    turns = spark.read.parquet(CORPUS)
    out = {"n_turns": turns.count(), "n_groups": N_GROUPS}

    # staging (untimed): the bucketed raw table backfill prunes from
    sio.write_table(turns, RAW, partition_key="conv_id")
    print("PHASE raw_staged", flush=True)

    # ── full one-shot rebuild (the non-resumable baseline) ─────────
    t0 = time.monotonic()
    good, _ = split_rejects(extract_triples(turns))
    sio.write_table(good, STAGE_FULL, partition_key="conv_id")
    out["full_rebuild_s"] = round(time.monotonic() - t0, 2)
    print(f"PHASE full_rebuild {out['full_rebuild_s']}s", flush=True)

    # ── chunked backfill, one group per call (resume granularity) ──
    group_walls = []
    t_total = time.monotonic()
    for _ in range(N_GROUPS):
        t0 = time.monotonic()
        res = backfill_triples(
            spark, RAW, STAGE_BF, n_groups=N_GROUPS, max_groups_per_call=1
        )
        group_walls.append(round(time.monotonic() - t0, 2))
        print(f"PHASE backfill_group {res.groups_run} {group_walls[-1]}s",
              flush=True)
    assert res.complete
    out["backfill_total_s"] = round(time.monotonic() - t_total, 2)
    out["backfill_group_walls_s"] = group_walls
    out["resumability_overhead_pct"] = round(
        100 * (out["backfill_total_s"] / out["full_rebuild_s"] - 1), 1
    )

    # equality spot check: same row count both builds
    n_full = sio.read_table(spark, STAGE_FULL).count()
    n_bf = sio.read_table(spark, STAGE_BF).count()
    out["rows_full"] = n_full
    out["rows_backfill"] = n_bf
    assert n_full == n_bf, (n_full, n_bf)

    print("BACKFILL_SCALE_RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
