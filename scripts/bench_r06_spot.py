"""Spot re-measure of the r6-touched paths (min-of-2, noop sink) —
the fast inner loop between full bench.py runs.

Usage: python scripts/bench_r06_spot.py [name ...]
names: materialized refresh_e2e clusters cc curation stream pipeline extract
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lexicator_spark import synth  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402

CORPUS = os.environ.get("BENCH_KG_CORPUS", "/tmp/bench_kg_corpus_300000")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(label, fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(f"{label:35s} {best:7.3f}s", flush=True)
    return best


def run_materialized(spark):
    from lexicator_spark.plans.pipeline import run_pipeline

    turns = spark.read.parquet(CORPUS)
    root = "/tmp/spot_kg_materialized"

    def go():
        shutil.rmtree(root, ignore_errors=True)
        run_pipeline(spark, turns, root, resume=False)

    best_of("kg_pipeline_materialized", go)


def run_refresh_e2e(spark):
    from pyspark.sql import Window as W

    from lexicator_spark.plans.pipeline import run_pipeline
    from lexicator_spark.plans.refresh import refresh_pipeline

    turns = spark.read.parquet(CORPUS)
    root = "/tmp/spot_kg_materialized"
    # ALWAYS rebuild: a leftover root from a prior spot run has the
    # deltas already applied, turning the refresh into a 0-changed
    # no-op and the "measurement" into fiction
    shutil.rmtree(root, ignore_errors=True)
    run_pipeline(spark, turns, root, resume=False)
    last_turns = (
        turns.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))),
        ).filter("rn = 1").drop("rn")
    )
    turns_now = turns
    walls = []
    for mod in (6, 7):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        refresh_pipeline(spark, turns_now, root)
        walls.append(time.monotonic() - t0)
    print(f"{'refresh_e2e_sparse':35s} {min(walls):7.3f}s  runs={[round(w,2) for w in walls]}", flush=True)


def run_refresh_1pct(spark):
    from pyspark.sql import Window as W

    from lexicator_spark.operators.incremental import refresh_triples_partitioned

    turns = spark.read.parquet(CORPUS)
    root = "/tmp/spot_kg_materialized"
    raw = os.path.join(root, "triples_raw")
    last_turns = (
        turns.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))),
        ).filter("rn = 1").drop("rn")
    )
    turns_now = turns
    for name, modulus, mods in (
        ("refresh_1pct", 100, (0, 1)),
        ("refresh_sparse", 30_000, (2, 3)),
    ):
        walls = []
        for mod in mods:
            extra = last_turns.filter(
                F.pmod(F.xxhash64("conv_id"), F.lit(modulus)) == mod
            ).withColumn("turn_idx", F.col("turn_idx") + 1)
            turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
            t0 = time.monotonic()
            refresh_triples_partitioned(spark, turns_now, raw)
            walls.append(time.monotonic() - t0)
        print(f"{name:35s} {min(walls):7.3f}s  runs={[round(w,2) for w in walls]}", flush=True)
    # feed mode
    walls = []
    for mod in (4, 5):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        feed = extra.select("conv_id").distinct().localCheckpoint(eager=True)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        refresh_triples_partitioned(spark, turns_now, raw, change_feed=feed)
        walls.append(time.monotonic() - t0)
    print(f"{'refresh_sparse_feed':35s} {min(walls):7.3f}s  runs={[round(w,2) for w in walls]}", flush=True)


def run_clusters(spark):
    from lexicator_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    best_of(
        "dedup_minhash_clusters",
        lambda: _force(D.near_dup_clusters(docs, method="minhash_star", threshold=0.6)),
    )


def run_cc(spark):
    import __spark_entry__ as E

    best_of(
        "kg_connected_components",
        lambda: _force(E.queries()["kg_connected_components"](spark, SF_DIR)),
    )


def run_curation(spark):
    from lexicator_spark.operators import curation as CU
    from lexicator_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def go():
        clusters = D.near_dup_clusters(docs, method="minhash_star", threshold=0.6)
        cur = CU.curate_corpus(docs, clusters)
        kept = docs.join(
            cur.filter(F.col("keep")).select("doc_id", "split"), "doc_id"
        ).withColumn("p_bucket", F.pmod(F.col("doc_id"), F.lit(8)))
        _force(CU.pack_sequences(kept, budget=2048, partition_cols=("split", "p_bucket")))

    best_of("corpus_curation_full", go)


def run_extract(spark):
    from lexicator_spark.operators.extract import extract_triples, split_rejects
    from lexicator_spark.sources import io as sio

    turns = spark.read.parquet(CORPUS)
    scratch = "/tmp/spot_stage_a_full"

    def go():
        shutil.rmtree(scratch, ignore_errors=True)
        good, _ = split_rejects(extract_triples(turns))
        sio.write_table(good, scratch, partition_key="conv_id")

    best_of("extract_full_rebuild", go)
    shutil.rmtree(scratch, ignore_errors=True)


def run_pipeline_q(spark):
    import bench as B

    kg = min(
        (B.run_kg_pipeline(spark, CORPUS) for _ in range(2)),
        key=lambda r: r["kg_pipeline_sec"],
    )
    print(f"{'kg_pipeline':35s} {kg['kg_pipeline_sec']:7.3f}s", flush=True)


def run_stream(spark):
    import glob
    from datetime import timedelta

    from lexicator_spark.streaming import ingest

    turns_df = spark.read.parquet(CORPUS)
    stream_in = "/tmp/bench_stream_in"
    ckpt = "/tmp/spot_stream_ckpt"
    sub = turns_df.filter(F.pmod(F.xxhash64("conv_id"), F.lit(10)) == 0)
    if not os.path.exists(os.path.join(stream_in, "_ready")):
        shutil.rmtree(stream_in, ignore_errors=True)
        sub.repartition(11).write.parquet(stream_in)
        far = synth.EPOCH + timedelta(days=90)
        for i, ts in enumerate((far, far + timedelta(days=1))):
            staging = f"/tmp/spot_stream_sentinel_{i}"
            shutil.rmtree(staging, ignore_errors=True)
            synth.corpus_df(
                spark,
                synth.Corpus(rows=[("wm_sentinel", i, "user", "advance", None, ts)]),
            ).coalesce(1).write.parquet(staging)
            part = glob.glob(staging + "/part-*.parquet")[0]
            dst = os.path.join(stream_in, f"zz_sentinel_{i}.parquet")
            shutil.copy(part, dst)
            tm = time.time() + 100 + i
            os.utime(dst, (tm, tm))
            shutil.rmtree(staging, ignore_errors=True)
        open(os.path.join(stream_in, "_ready"), "w").close()
    n = sub.count()

    def go():
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = (
            spark.readStream.schema(ingest.TURN_SCHEMA)
            .option("maxFilesPerTrigger", 6)
            .parquet(stream_in)
        )
        q = (
            ingest.stateful_replies_stream_buffered(stream, watermark_delay="2 days")
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)

    w = best_of("stream_replies_buffered", go)
    print(f"{'stream rows/s':35s} {n / w:10.1f}", flush=True)


RUNNERS = {
    "materialized": run_materialized,
    "refresh_e2e": run_refresh_e2e,
    "refresh_1pct": run_refresh_1pct,
    "clusters": run_clusters,
    "cc": run_cc,
    "curation": run_curation,
    "extract": run_extract,
    "pipeline": run_pipeline_q,
    "stream": run_stream,
}


def main():
    names = sys.argv[1:] or list(RUNNERS)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]", app_name="spot_r06", shuffle_partitions=cpus
    )
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth.write_corpus_parquet(spark, CORPUS, n_convs=300_000)
    _force(spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).limit(1000))
    _force(
        spark.range(1000).toDF("x")
        .select(F.pandas_udf(lambda s: s + 1, "long")(F.col("x")))
    )
    for name in names:
        RUNNERS[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
