"""Probe: Stage-D materialize — union-write vs bucket-file-copy.

Measures, on the bench corpus (fresh JVM, local[32], sf0.1 shapes):
  1. a fresh run_pipeline build, with per-stage walls from lineage;
  2. the current Stage-D shape in isolation (union + p_hash exchange +
     bucketed write of raw ∪ same_as ∪ canonical);
  3. the copy shape: Hadoop FileUtil.copy of the raw table's p_hash=*
     dirs + one tiny append of same_as ∪ canonical into the NULL
     bucket — identical table content (verified by row counts + a
     value hash over both layouts).

Usage: python scripts/bench_r06b_matcopy.py
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lexicator_spark import synth  # noqa: E402
from lexicator_spark.plans.pipeline import run_pipeline  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402
from lexicator_spark.sources import fsutil, io as sio  # noqa: E402

N_CONVS = int(os.environ.get("BENCH_KG_CONVS", "300000"))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="matcopy_probe",
                      shuffle_partitions=cpus)
    corpus_path = f"/tmp/bench_kg_corpus_{N_CONVS}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        shutil.rmtree(corpus_path, ignore_errors=True)
        synth.write_corpus_parquet(spark, corpus_path, n_convs=N_CONVS)
    turns = spark.read.parquet(corpus_path)

    root = "/tmp/probe_matcopy_root"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.monotonic()
    res = run_pipeline(spark, turns, root, resume=False)
    build_wall = time.monotonic() - t0
    print(f"fresh build: {build_wall:.2f}s")
    for row in res.lineage:
        print(f"  stage {row['stage']:<12} wall_ms={row['wall_ms']}")

    raw_path = os.path.join(root, "triples_raw")
    raw = sio.read_table(spark, raw_path)
    same_as = sio.read_table(spark, os.path.join(root, "same_as"))
    canonical = sio.read_table(spark, os.path.join(root, "canonical"))

    # current shape: union + bucketed overwrite
    for i in range(2):
        tgt = "/tmp/probe_mat_union"
        shutil.rmtree(tgt, ignore_errors=True)
        t0 = time.monotonic()
        sio.write_table(
            raw.unionByName(same_as).unionByName(canonical), tgt,
            partition_key="conv_id",
        )
        print(f"union-write run{i}: {time.monotonic() - t0:.2f}s")

    # copy shape
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001

    def jpath(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = jpath(raw_path).getFileSystem(conf)
    nb_row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(None).cast("string")), F.lit(64)).cast("int").alias("b")
    ).collect()[0]
    nb = nb_row.b
    for i in range(2):
        tgt = "/tmp/probe_mat_copy"
        shutil.rmtree(tgt, ignore_errors=True)
        t0 = time.monotonic()
        os.makedirs(tgt, exist_ok=True)
        n_copied = 0
        for st in fs.listStatus(jpath(raw_path)):
            name = st.getPath().getName()
            if name.startswith("p_hash="):
                jvm.org.apache.hadoop.fs.FileUtil.copy(
                    fs, st.getPath(), fs, jpath(os.path.join(tgt, name)),
                    False, True, conf,
                )
                n_copied += 1
        t_copy = time.monotonic() - t0
        extra = same_as.unionByName(canonical).coalesce(1)
        extra.withColumn("p_hash", F.lit(nb)).write.mode("append").partitionBy(
            "p_hash"
        ).parquet(tgt)
        fsutil.write_text(spark, os.path.join(tgt, "_schema.json"),
                          raw.schema.json())
        fsutil.write_text(
            spark, os.path.join(tgt, "_buckets.json"),
            '{"partition_key": "conv_id", "n_buckets": 64}')
        print(f"copy run{i}: total {time.monotonic() - t0:.2f}s "
              f"(dir copies {t_copy:.2f}s, {n_copied} buckets)")

    # equality: row count + value hash over both layouts
    a = sio.read_table(spark, "/tmp/probe_mat_union")
    b = sio.read_table(spark, "/tmp/probe_mat_copy")

    def fingerprint(df):
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    fa, fb = fingerprint(a), fingerprint(b)
    print(f"union layout fingerprint: {fa}")
    print(f"copy  layout fingerprint: {fb}")
    print("MATCH" if fa == fb else "MISMATCH !!")
    spark.stop()


if __name__ == "__main__":
    main()
