"""r6 optimization probes: decompose the expensive bench paths into
their component jobs so each optimization targets a measured cost, not
a guess (guide §1.1/§1.2).  Pieces probed:

  stage_a      — run_pipeline's extract stage variants (persist vs
                 recompute vs checkpoint) on the bench corpus
  pipeline     — the non-stage overhead of run_pipeline (frontier,
                 surface_stats, lineage) piece by piece
  cc           — connected_components input re-evaluation count
  refresh      — refresh_triples_partitioned job-by-job walls

Usage: python scripts/bench_r06_probe.py [piece ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lexicator_spark import synth  # noqa: E402
from lexicator_spark.operators.extract import extract_triples, split_rejects  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402
from lexicator_spark.sources import io as sio  # noqa: E402

CORPUS = os.environ.get("BENCH_KG_CORPUS", "/tmp/bench_kg_corpus_300000")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"  {label:55s} {time.monotonic() - t0:7.3f}s", flush=True)
    return out


def probe_stage_a(spark):
    turns = spark.read.parquet(CORPUS)
    root = "/tmp/probe_stage_a"

    def v_persist():
        """current shape: persist extracted, write rejects then good"""
        from pyspark import StorageLevel

        shutil.rmtree(root, ignore_errors=True)
        extracted = extract_triples(turns).persist(StorageLevel.MEMORY_AND_DISK)
        good, rejects = split_rejects(extracted)
        sio.write_table(rejects, os.path.join(root, "rejects"), partition_key=None)
        sio.write_table(good, os.path.join(root, "raw"), partition_key="conv_id")
        extracted.unpersist()

    def v_recompute():
        """no persist: write good directly (extraction fused with the
        write shuffle), recompute extraction for the rejects sink"""
        shutil.rmtree(root, ignore_errors=True)
        extracted = extract_triples(turns)
        good, rejects = split_rejects(extracted)
        sio.write_table(good, os.path.join(root, "raw"), partition_key="conv_id")
        sio.write_table(rejects, os.path.join(root, "rejects"), partition_key=None)

    def v_ckpt():
        """localCheckpoint instead of persist"""
        shutil.rmtree(root, ignore_errors=True)
        extracted = extract_triples(turns).localCheckpoint(eager=True)
        good, rejects = split_rejects(extracted)
        sio.write_table(rejects, os.path.join(root, "rejects"), partition_key=None)
        sio.write_table(good, os.path.join(root, "raw"), partition_key="conv_id")

    for name, fn in (("persist(MEM_DISK)+2 writes [current]", v_persist),
                     ("recompute (2 extractions, fused writes)", v_recompute),
                     ("localCheckpoint+2 writes", v_ckpt)):
        for i in range(2):
            t(f"stage_a {name} run{i}", fn)
    shutil.rmtree(root, ignore_errors=True)


def probe_pipeline(spark):
    """the ~9s of kg_pipeline_materialized not inside stage walls"""
    from lexicator_spark.operators.incremental import materialize_frontier
    from lexicator_spark.plans import pipeline as P
    from lexicator_spark.plans.refresh import ensure_surface_stats

    turns = spark.read.parquet(CORPUS)
    root = "/tmp/probe_pipe_ovh"
    shutil.rmtree(root, ignore_errors=True)
    raw = os.path.join(root, "triples_raw")
    good, _ = split_rejects(extract_triples(turns))
    t("stage-A write (reference)", lambda: sio.write_table(good, raw, partition_key="conv_id"))
    t("materialize_frontier", lambda: materialize_frontier(spark, turns, raw))
    t("ensure_surface_stats", lambda: ensure_surface_stats(spark, root, 64))
    t("_bucket_counts(raw)", lambda: P._bucket_counts(spark, raw))
    triples_a = sio.read_table(spark, raw)
    t("mention_counts_of_triples agg (noop)", lambda: _force(P.mention_counts_of_triples(triples_a)))
    from lexicator_spark.plans.refresh import surface_rollup
    stats = sio.read_table(spark, os.path.join(root, "_surface_stats"))
    t("surface_rollup(stats) (noop)", lambda: _force(surface_rollup(stats)))
    t("rows_in turns.count()", lambda: turns.count())
    t("getNumPartitions", lambda: triples_a.rdd.getNumPartitions())
    t("_write_lineage (5 stages)", lambda: P._write_lineage(
        spark, root,
        [({"stage": s, "rows_in": 1, "rows_out": 2, "wall_ms": 3,
           "n_partitions": 4}, [(b, 10) for b in range(64)]) for s in P.STAGES]))
    shutil.rmtree(root, ignore_errors=True)


def probe_cc(spark):
    """how much of the cluster queries is input re-evaluation"""
    from lexicator_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    edges = D.minhash_lsh_star_edges(docs, threshold=0.6).select(
        F.col("a").cast("string").alias("u"), F.col("b").cast("string").alias("v")
    )
    t("star edges single evaluation (noop)", lambda: _force(edges))
    t("star edges 2nd evaluation (noop)", lambda: _force(edges))
    from lexicator_spark.operators.canonicalize import connected_components
    t("connected_components(star edges) (noop)", lambda: _force(connected_components(edges)))
    t("full dedup_minhash_clusters (noop)", lambda: _force(
        D.near_dup_clusters(docs, method="minhash_star", threshold=0.6)))


def probe_refresh(spark):
    """job-by-job decomposition of a sparse detection-mode refresh"""
    from pyspark.sql import Window as W

    from lexicator_spark.operators.incremental import (
        refresh_triples_partitioned,
    )

    turns = spark.read.parquet(CORPUS)
    root = "/tmp/probe_refresh"
    shutil.rmtree(root, ignore_errors=True)
    raw = os.path.join(root, "triples_raw")
    good, _ = split_rejects(extract_triples(turns))
    sio.write_table(good, raw, partition_key="conv_id")
    from lexicator_spark.operators.incremental import materialize_frontier
    materialize_frontier(spark, turns, raw)

    last_turns = (
        turns.withColumn(
            "rn", F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx")))
        ).filter("rn = 1").drop("rn")
    )
    turns_now = turns
    for mod in (11, 12):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t(f"refresh_triples_partitioned sparse mod={mod}", lambda: refresh_triples_partitioned(spark, turns_now, raw))

    # now the pieces of one more refresh, by hand
    extra = last_turns.filter(
        F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == 13
    ).withColumn("turn_idx", F.col("turn_idx") + 1)
    turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
    floc = os.path.join(raw, "_frontier")
    frontier = sio.read_table(spark, floc)
    latest = turns_now.groupBy("conv_id").agg(F.max("turn_idx").alias("max_idx"))
    changed = t("detect: latest⋈frontier + ckpt", lambda: (
        latest.join(frontier, "conv_id", "left")
        .filter(F.col("done_max_idx").isNull() | (F.col("max_idx") > F.col("done_max_idx")))
        .select("conv_id").localCheckpoint(eager=True)))
    t("changed.count()", lambda: changed.count())
    bucket_of = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(64)).cast("int")
    touched = t("touched buckets collect", lambda: sorted(
        r.p_hash for r in changed.select(bucket_of.alias("p_hash")).distinct().collect()))
    kept = (
        sio.read_table(spark, raw, keep_bucket_col=True)
        .filter(F.col("p_hash").isin(touched)).drop("p_hash")
        .filter(F.col("conv_id").isNotNull())
        .join(changed, "conv_id", "left_anti")
    )
    from lexicator_spark.operators.incremental import _delta_good_triples
    replacement = kept.unionByName(_delta_good_triples(turns_now, changed, "native"))
    repl_ck = t("replacement localCheckpoint (kept + delta extract)",
                lambda: replacement.localCheckpoint(eager=True))
    t("present probe distinct collect", lambda: sio.with_partition_hash(repl_ck).select("p_hash").distinct().collect())
    t("upsert write (dynamic overwrite)", lambda: sio.with_partition_hash(repl_ck)
        .repartition(F.col("p_hash")).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").partitionBy("p_hash")
        .parquet(raw))
    new_frontier = (
        turns_now.join(changed, "conv_id", "left_semi")
        .groupBy("conv_id").agg(F.max("turn_idx").alias("done_max_idx"))
    )
    kept_frontier = (
        sio.read_table(spark, floc, keep_bucket_col=True)
        .filter(F.col("p_hash").isin(touched)).drop("p_hash")
        .join(changed, "conv_id", "left_anti")
    )
    fr = kept_frontier.unionByName(new_frontier)
    fr_ck = t("frontier replacement ckpt (full-snapshot semi-join agg)",
              lambda: fr.localCheckpoint(eager=True))
    nf2 = latest.join(changed, "conv_id", "left_semi").withColumnRenamed("max_idx", "done_max_idx")
    fr2 = kept_frontier.unionByName(nf2)
    t("frontier replacement ckpt (latest-reuse variant)",
      lambda: fr2.localCheckpoint(eager=True))
    t("frontier upsert write", lambda: sio.with_partition_hash(fr_ck)
        .repartition(F.col("p_hash")).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").partitionBy("p_hash")
        .parquet(floc))
    shutil.rmtree(root, ignore_errors=True)


def main():
    pieces = sys.argv[1:] or ["stage_a", "pipeline", "cc", "refresh"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="probe_r06",
                      shuffle_partitions=cpus)
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth.write_corpus_parquet(spark, CORPUS, n_convs=300_000)
    # warm-up
    _force(spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).limit(1000))
    for p in pieces:
        print(f"== {p} ==", flush=True)
        globals()[f"probe_{p}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
