"""Interleaved fresh-JVM A/B attribution for a driver-bench query
(round 5, VERDICT r4 'next' #1: dedup_minhash_clusters 4.24 → 5.42 s).

Method (the one that settled kg_pipeline_materialized in r4,
BENCH/BASELINE.md): check out the two code versions side by side,
then alternate fresh-JVM runs A B A B ... on the idle box — each
child process runs the SAME query at the SAME sf with min-of-2
in-process walls.  Interleaving cancels slow-box drift; fresh JVMs
cancel warm-cache asymmetry.  If the A and B distributions overlap,
the driver-observed delta is sandbox noise; if they separate, the
code delta is real and gets per-stage profiling.

Usage:
    git worktree add /tmp/ab_r3 3051bb4
    python scripts/ab_minhash.py /tmp/ab_r3 /root/repo --rounds 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
repo = {repo!r}
sys.path.insert(0, repo)
import __spark_entry__ as entry
from pyspark.sql import functions as F
from lexicator_spark.session import get_spark

spark = get_spark(master="local[32]", shuffle_partitions=32, app_name="ab_minhash")
sf_dir = "/root/testdata/sf0.1"

def force(df):
    df.write.format("noop").mode("overwrite").save()

# same warm-ups as bench.py: parquet scan + Python-worker spawn
import os as _os
force(spark.read.parquet(_os.path.join(sf_dir, "lineitem.parquet")).limit(1000))
force(spark.range(1000).toDF("x").select(
    F.pandas_udf(lambda s: s + 1, "long")(F.col("x"))))

fn = entry.queries()[{query!r}]
walls = []
for _ in range(2):
    t0 = time.monotonic()
    force(fn(spark, sf_dir))
    walls.append(round(time.monotonic() - t0, 3))
print("AB_RESULT " + json.dumps({{"repo": repo, "walls": walls,
                                  "best": min(walls)}}), flush=True)
spark.stop()
"""


def run_child(repo: str, query: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=repo, query=query)],
        capture_output=True, text=True, timeout=1800,
        cwd=repo,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"no result from {repo}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("repo_a")
    ap.add_argument("repo_b")
    ap.add_argument("--query", default="dedup_minhash_clusters")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    results = {args.repo_a: [], args.repo_b: []}
    for rnd in range(args.rounds):
        for repo in (args.repo_a, args.repo_b):
            r = run_child(os.path.abspath(repo), args.query)
            results[repo].append(r["best"])
            print(f"round {rnd} {repo}: walls={r['walls']} best={r['best']}",
                  flush=True)
    print("AB_SUMMARY " + json.dumps({
        "query": args.query,
        "a": {"repo": args.repo_a, "bests": results[args.repo_a],
              "min": min(results[args.repo_a])},
        "b": {"repo": args.repo_b, "bests": results[args.repo_b],
              "min": min(results[args.repo_b])},
    }), flush=True)


if __name__ == "__main__":
    main()
