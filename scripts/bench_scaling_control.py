"""Scaling-control experiment (round 5, VERDICT r4 'next' #2).

The 97.5M-turn third datapoint read 2→8 efficiency 0.777 and
BENCH/BASELINE.md *argued* (from thr(2) flatness and the 32-thread
heap death) that the binding constraint is the 8-thread CONFIG at
fixed partitions-per-core — per-task shuffle volume grows linearly
with the corpus while all tasks share one JVM heap and one /tmp disk
— not the dataflow.  This script turns that narrative into a
measurement: it re-runs a single level on the same corpus with the
two suspected factors corrected —

  * ``--partitions`` decoupled from the thread count (e.g. 4× threads,
    which is what a real N-executor job would use anyway), and
  * ``--driver-mem`` normalized per thread (the 32-thread run needed
    48g ⇒ 12g for 8 threads keeps heap-per-task constant),

then reports throughput next to the r4 baseline so the efficiency can
be recomputed under the corrected config.

Usage:
    python scripts/bench_scaling_control.py --cpus 8 --partitions 32 \
        --driver-mem 12g --n-convs 30000000 --reps 2

Prints one ``SCALING_CONTROL_RESULT {...}`` JSON line (and each rep's
raw result line as it lands, so a killed run still yields data).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Same measured job as scripts/bench_scaling.py CHILD: extract → link
# → canonicalize with stage boundaries materialized, fresh JVM,
# pipeline wall only.  Only the session config differs.
CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from lexicator_spark.session import get_spark
from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.operators.link import build_catalog, link_mentions
from lexicator_spark.operators.canonicalize import connected_components, canonical_of_triples

cpus = {cpus}
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions={partitions},
                  app_name=f"scaling_ctrl_{{cpus}}")
turns = spark.read.parquet({corpus!r})
n_turns = turns.count()
split_rejects(extract_triples(turns.limit(2000)))[0].count()  # warm-up

t0 = time.monotonic()
triples, _ = split_rejects(extract_triples(turns))
triples = triples.localCheckpoint(eager=True)
same_as = link_mentions(triples, build_catalog(spark)).localCheckpoint(eager=True)
assignments = connected_components(
    same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v")))
canonical = canonical_of_triples(assignments)
n_triples = triples.unionByName(same_as).unionByName(canonical).count()
wall = time.monotonic() - t0
print("CHILD_RESULT " + json.dumps({{
    "cpus": cpus, "partitions": {partitions}, "wall_s": round(wall, 2),
    "n_turns": n_turns, "n_triples": n_triples,
    "turns_per_sec": round(n_turns / wall, 1)}}), flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--partitions", type=int, required=True)
    ap.add_argument("--driver-mem", default=None)
    ap.add_argument("--n-convs", type=int, default=30_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    corpus = f"/tmp/bench_kg_corpus_{args.n_convs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {corpus} (generate via bench_scaling.py)")

    env = dict(os.environ)
    if args.driver_mem:
        env["SPARK_DRIVER_MEM"] = args.driver_mem

    best = None
    for rep in range(args.reps):
        code = CHILD.format(repo=REPO, cpus=args.cpus,
                            partitions=args.partitions, corpus=corpus)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=7200, env=env,
        )
        r = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                r = json.loads(line[len("CHILD_RESULT "):])
        if r is None:
            raise RuntimeError(
                f"no result (rep {rep}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
            )
        r["driver_mem"] = args.driver_mem or env.get("SPARK_DRIVER_MEM", "8g")
        print(f"REP_{rep} " + json.dumps(r), flush=True)
        if best is None or r["wall_s"] < best["wall_s"]:
            best = r
    best["reps"] = args.reps
    print("SCALING_CONTROL_RESULT " + json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
