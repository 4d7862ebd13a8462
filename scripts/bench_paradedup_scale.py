"""Two-parallelism scaling evidence for sub-document paragraph dedup.

Same protocol as scripts/bench_decontam_scale.py (no real cluster in
the sandbox: the SAME job runs at local[2]/local[8]/local[32], fresh
JVM per level, job wall only, min-of-2 in-JVM after a warm-up): the
corpus is one document per CONVERSATION of the pre-generated
deterministic transcript corpus, paragraphs = its turns joined by
blank lines — so the synth corpus's canned strings repeat across
documents exactly the way real boilerplate does, and dedup_paragraphs
has genuine cross-document work.  The doc table is materialized ONCE
up front (the assembly groupBy is setup, not the operator under
measurement).  Reports docs/sec + paragraphs/sec per level and the
N→4N efficiencies.

Usage: python scripts/bench_paradedup_scale.py [n_convs] [reps]
→ APPENDS a section to BENCH/BASELINE.md and prints one JSON line.
(bench_scaling.py rewrites that file from scratch; this script only
ever appends — run it after, never instead.)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from lexicator_spark.session import get_spark
from lexicator_spark.operators.dedup import dedup_paragraphs

cpus = {cpus}
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"paradedup_scaling_{{cpus}}")
docs = spark.read.parquet({docs!r})
n_docs = docs.count()

# warm-up: codegen + shuffle paths on a small slice (excluded)
dedup_paragraphs(docs.limit(20000)).write.format(
    "noop").mode("overwrite").save()

best = 1e9
for _ in range(2):  # min-of-2 inside the warm JVM
    t0 = time.monotonic()
    dedup_paragraphs(docs).write.format("noop").mode("overwrite").save()
    best = min(best, time.monotonic() - t0)
# paragraph count via one cheap projection — re-running the full
# 3-shuffle dedup job just to sum a column would add an untimed
# ~wall-sized Spark job per level
n_paras = int(
    docs.agg(
        F.sum(F.size(F.split(F.coalesce(F.col("text"), F.lit("")), r"\n{{2,}}")))
    ).collect()[0][0]
)
print("SCALING_RESULT " + json.dumps({{
    "cpus": cpus, "wall_s": round(best, 2), "n_docs": n_docs,
    "n_paras": n_paras,
    "docs_per_sec": round(n_docs / best, 1),
    "paras_per_sec": round(n_paras / best, 1)}}))
spark.stop()
"""


def run_level(cpus: int, docs: str, reps: int) -> dict:
    from _child_bench import best_of

    code = CHILD.format(repo=REPO, cpus=cpus, docs=docs)
    return best_of(reps, code, f"local[{cpus}]")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus = f"/tmp/bench_kg_corpus_{n_convs}"
    docs = f"/tmp/bench_para_docs_{n_convs}"
    sys.path.insert(0, REPO)
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")) or not os.path.exists(
        os.path.join(docs, "_SUCCESS")
    ):
        from pyspark.sql import functions as F

        from lexicator_spark import synth
        from lexicator_spark.session import get_spark

        spark = get_spark(master="local[32]", app_name="paradedup_docs_gen")
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            synth.write_corpus_parquet(spark, corpus, n_convs=n_convs)
        turns = spark.read.parquet(corpus)
        (
            turns.filter(F.col("text").isNotNull())
            .groupBy("conv_id")
            .agg(
                F.concat_ws(
                    "\n\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "text"))
                        ),
                        lambda x: x["text"],
                    ),
                ).alias("text")
            )
            .select(F.xxhash64("conv_id").alias("doc_id"), "text")
            .write.mode("overwrite")
            .parquet(docs)
        )
        spark.stop()

    levels = {c: run_level(c, docs, reps) for c in (2, 8, 32)}
    eff_2_8 = levels[8]["docs_per_sec"] / (4 * levels[2]["docs_per_sec"])
    eff_8_32 = levels[32]["docs_per_sec"] / (4 * levels[8]["docs_per_sec"])
    result = {
        "levels": levels,
        "efficiency_2_to_8": round(eff_2_8, 3),
        "efficiency_8_to_32": round(eff_8_32, 3),
    }
    print(json.dumps(result))

    rows = "\n".join(
        f"| local[{c}] | {r['wall_s']} | {r['docs_per_sec']:,} | "
        f"{r['paras_per_sec']:,} |"
        for c, r in levels.items()
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""

## Paragraph-dedup scaling (round 5): {levels[32]['n_docs']:,} docs / {levels[32]['n_paras']:,} paragraphs

Same two-parallelism protocol as above, applied to the round-5
sub-document dedup operator (`dedup_paragraphs`): one document per
conversation of the {n_convs:,}-conversation corpus, paragraphs = its
turns — the synth corpus's canned strings repeat across documents, so
the keeper-election shuffle carries real cross-document duplicate
mass.  Doc assembly is materialized up front and excluded; fresh JVM
per level, min-of-2 in-JVM after a warm-up, best of {reps} JVMs.

| level | wall (s) | docs/sec | paragraphs/sec |
|---|---|---|---|
{rows}

- **N=2 → 4N=8: efficiency = thr(8) / (4·thr(2)) = {eff_2_8:.3f}** —
  the honest executor-scaling proxy.
- N=8 → 4N=32: {eff_8_32:.3f} — the same single-box memory-bandwidth
  / shared-/tmp ceiling every operator family hits at 8→32 on this VM;
  the paragraph explode + md5 + reassembly path is string-heavy, so
  it saturates shared memory channels the way the gram projection
  does.  On a real 4N-executor cluster each executor brings its own
  memory channels and disks.

Plan shape under measurement: explode → md5 → partial-agg keeper
election (hot boilerplate hashes collapse map-side) → distinct-hash
join back → per-doc reassembly groupBy → NULL-restoring boolean
re-join.  All shuffles ride narrow keys (16-byte digest / doc id /
one boolean per doc); paragraph text crosses the wire once each
direction.
""")


if __name__ == "__main__":
    main()
