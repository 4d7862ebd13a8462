"""Control experiment for the paragraph-dedup scaling shape.

The first paradedup run measured 2->8 efficiency 0.611 with 8->32 at
0.855 — inverted vs every other operator family on this box.  The
hypothesis was a GC-thread shortcut: that session's local[2] child JVM
appeared to average ~6.7 cores, and with GC thread counts uncapped
(default = sized for all 32 hardware threads) a "2-core" level could do
its garbage collection on the other 30 cores, inflating thr(2).  The
round-5 run of this script REFUTED that hypothesis for the 0.611:
uncapped local[2] consumed 2.14 effective cores and the uncapped 2->8
re-measured at 0.955 (pinned 0.926) — the original 0.611 was a slow
noisy-neighbor local[8] sample, not GC threading (see BENCH/BASELINE.md
"Paragraph-dedup GC-thread control").  The script remains useful as the
measurement: it runs

  for each level in (2, 8, 32) x {uncapped, pinned}:
      fresh JVM; pinned = -XX:ParallelGCThreads=cpus
                          -XX:ConcGCThreads=max(1, cpus // 4)
      warm-up, then min-of-2 measured runs of dedup_paragraphs;
      record wall AND the JVM's /proc utime+stime delta across the
      best run -> effective cores actually consumed.

On a real cluster an executor's GC threads are sized to its container
cores, so the PINNED rows are the honest N-vs-4N proxy; the uncapped
rows quantify whether the single-box default flatters the small level
(in the round-5 run: it didn't, <=8% at every level).

Usage: python scripts/bench_paradedup_gccontrol.py [n_convs] [reps]
-> APPENDS a section to BENCH/BASELINE.md and prints one JSON line.
Requires the docs table pre-built by bench_paradedup_scale.py.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})

cpus = {cpus}
pin = {pin}
if pin:
    conc = max(1, cpus // 4)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f'--driver-java-options "-XX:ParallelGCThreads={{cpus}} '
        f'-XX:ConcGCThreads={{conc}}" pyspark-shell'
    )

from pyspark.sql import functions as F
from lexicator_spark.session import get_spark
from lexicator_spark.operators.dedup import dedup_paragraphs

spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"paradedup_gcctl_{{cpus}}_{{pin}}")
jvm_pid = spark.sparkContext._gateway.proc.pid

def jvm_cpu_s():
    # utime + stime of the gateway JVM, in seconds (field 14+15 of
    # /proc/pid/stat, clock ticks)
    with open(f"/proc/{{jvm_pid}}/stat") as f:
        parts = f.read().rsplit(") ", 1)[1].split()
    return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")

docs = spark.read.parquet({docs!r})
n_docs = docs.count()
dedup_paragraphs(docs.limit(20000)).write.format(
    "noop").mode("overwrite").save()

best = None
for _ in range(2):  # min-of-2 inside the warm JVM
    c0, t0 = jvm_cpu_s(), time.monotonic()
    dedup_paragraphs(docs).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    if best is None or wall < best["wall_s"]:
        best = {{"wall_s": round(wall, 2),
                 "jvm_cpu_s": round(jvm_cpu_s() - c0, 1)}}
print("SCALING_RESULT " + json.dumps({{
    "cpus": cpus, "pinned": pin, "n_docs": n_docs,
    "wall_s": best["wall_s"], "jvm_cpu_s": best["jvm_cpu_s"],
    "effective_cores": round(best["jvm_cpu_s"] / best["wall_s"], 2),
    "docs_per_sec": round(n_docs / best["wall_s"], 1)}}))
spark.stop()
"""


def run_level(cpus: int, pin: bool, docs: str, reps: int) -> dict:
    from _child_bench import best_of

    code = CHILD.format(repo=REPO, cpus=cpus, pin=pin, docs=docs)
    return best_of(reps, code, f"local[{cpus}] pin={pin}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    docs = f"/tmp/bench_para_docs_{n_convs}"
    if not os.path.exists(os.path.join(docs, "_SUCCESS")):
        raise SystemExit(
            f"{docs} missing - run bench_paradedup_scale.py first"
        )

    grid = {}
    for cpus in (2, 8, 32):
        for pin in (False, True):
            grid[(cpus, pin)] = run_level(cpus, pin, docs, reps)

    def eff(lo, hi, pin):
        return round(
            grid[(hi, pin)]["docs_per_sec"]
            / (4 * grid[(lo, pin)]["docs_per_sec"]),
            3,
        )

    result = {
        "levels": {f"{c}_{'pin' if p else 'unc'}": r
                   for (c, p), r in grid.items()},
        "eff_2_8_uncapped": eff(2, 8, False),
        "eff_2_8_pinned": eff(2, 8, True),
        "eff_8_32_uncapped": eff(8, 32, False),
        "eff_8_32_pinned": eff(8, 32, True),
    }
    print(json.dumps(result))

    rows = "\n".join(
        f"| local[{c}] | {'pinned' if p else 'uncapped'} | "
        f"{r['wall_s']} | {r['jvm_cpu_s']} | {r['effective_cores']} | "
        f"{r['docs_per_sec']:,} |"
        for (c, p), r in grid.items()
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""

## Paragraph-dedup GC-thread control re-run ({grid[(32, True)]['n_docs']:,} docs)

Grid: GC threads uncapped vs pinned per level
(`-XX:ParallelGCThreads=N -XX:ConcGCThreads=max(1,N/4)`), JVM
/proc cpu-seconds recorded across the best run.  Interpret the
numbers — the script draws no conclusion: compare `effective cores`
to the nominal level (a large gap at local[2] means GC threading IS
inflating the small level) and the uncapped-vs-pinned 2→8 ratios
(close together means any earlier outlier was session variance, as
the round-5 control found for the original 0.611).

| level | GC threads | wall (s) | jvm cpu (s) | effective cores | docs/sec |
|---|---|---|---|---|---|
{rows}

- Pinned (executor-shaped) 2→8 efficiency: {result['eff_2_8_pinned']};
  8→32: {result['eff_8_32_pinned']}.  Uncapped:
  2→8 {result['eff_2_8_uncapped']}, 8→32 {result['eff_8_32_uncapped']}.
- Pinned is the headline config either way: it matches what a
  container-isolated executor actually gets.
""")


if __name__ == "__main__":
    main()
