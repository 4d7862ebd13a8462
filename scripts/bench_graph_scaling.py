"""Two-parallelism scaling evidence for the ITERATIVE-GRAPH family
(r5 VERDICT item 5): PageRank over the 29.3M-turn corpus's co-mention
graph at local[2] vs local[8] — the N→4N pairing every other operator
family already has (2→8 is the compute-bound regime on this box; 8→32
is the documented shared-memory/disk artifact, BENCH/BASELINE.md).

Two timed units per level (fresh JVM each, min-of-reps):
  - edge derivation: ``cooccurrence_edges(weighted=True)`` over the
    26.7M-row mentions table — the corpus-scaled aggregation that
    feeds the family;
  - PageRank: 10 FIXED iterations (no tol — identical rounds at both
    levels), weighted, over the derived 5.9M-edge graph read from
    parquet — the iterative-join loop itself.

Inputs are pre-staged (untimed) by a local[32] run if absent:
mentions parquet + edges parquet under /tmp.  Prints one JSON line
``GRAPH_SCALING_RESULT {...}``; recorded in BENCH/BASELINE.md.

Usage: python scripts/bench_graph_scaling.py [n_convs] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 9_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CORPUS = f"/tmp/bench_kg_corpus_{N_CONVS}"
MENTIONS = f"/tmp/graph_scaling_mentions_{N_CONVS}"
EDGES = f"/tmp/graph_scaling_edges_{N_CONVS}"

STAGE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from lexicator_spark import rules, synth
from lexicator_spark.operators import graph as G
from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.session import get_spark
import os
spark = get_spark(master="local[32]", shuffle_partitions=64,
                  app_name="graph_scaling_stage")
if not os.path.exists(os.path.join({corpus!r}, "_SUCCESS")):
    synth.write_corpus_parquet(spark, {corpus!r}, n_convs={n_convs})
turns = spark.read.parquet({corpus!r})
triples, _ = split_rejects(extract_triples(turns))
mentions = triples.filter(F.col("pred") == rules.PRED_MENTIONS).select(
    "conv_id", F.col("obj").alias("surface"))
mentions.write.mode("overwrite").parquet({mentions!r})
m = spark.read.parquet({mentions!r})
edges, _ = G.cooccurrence_edges(m, weighted=True)
edges.write.mode("overwrite").parquet({edges!r})
print("STAGED", m.count(), spark.read.parquet({edges!r}).count())
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from lexicator_spark.operators import graph as G
from lexicator_spark.session import get_spark

cpus = {cpus}
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"graph_scaling_{{cpus}}")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

mentions = spark.read.parquet({mentions!r})
noop(mentions.limit(1000))  # scan warm-up, excluded

t0 = time.monotonic()
edges, _ = G.cooccurrence_edges(mentions, weighted=True)
noop(edges)
w_edges = time.monotonic() - t0

edge_frame = spark.read.parquet({edges!r})
t0 = time.monotonic()
ranks = G.pagerank(edge_frame, iterations=10, tol=None,
                   weight_col="n_groups")
noop(ranks)
w_pr = time.monotonic() - t0

print("CHILD_RESULT " + json.dumps(
    {{"cpus": cpus, "edges_s": round(w_edges, 2),
      "pagerank10_s": round(w_pr, 2)}}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    best = None
    for _ in range(REPS):
        code = CHILD.format(repo=REPO, cpus=cpus, mentions=MENTIONS, edges=EDGES)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=7200,
        )
        r = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                r = json.loads(line[len("CHILD_RESULT "):])
        if r is None:
            raise RuntimeError(
                f"no result from local[{cpus}]:"
                f"\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
            )
        if best is None or (r["edges_s"] + r["pagerank10_s"]) < (
            best["edges_s"] + best["pagerank10_s"]
        ):
            best = r
    return best


def main() -> None:
    if not os.path.exists(os.path.join(EDGES, "_SUCCESS")):
        code = STAGE.format(
            repo=REPO, corpus=CORPUS, n_convs=N_CONVS,
            mentions=MENTIONS, edges=EDGES,
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=7200,
        )
        if "STAGED" not in out.stdout:
            raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    r2 = run_level(2)
    r8 = run_level(8)
    eff = {
        k: round(r2[k] / r8[k] / 4.0, 3)
        for k in ("edges_s", "pagerank10_s")
    }
    print(
        "GRAPH_SCALING_RESULT "
        + json.dumps({"local2": r2, "local8": r8, "efficiency_2_to_8": eff})
    )


if __name__ == "__main__":
    main()
