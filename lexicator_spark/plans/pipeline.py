"""Stage orchestration: extract → link → canonicalize → materialize,
with per-stage checkpoints (resume skips completed stages) and
per-stage lineage metrics — the Spark re-design of lexicator's
pipeline-of-ContentStores DAG (``lexicator/__main__.py`` ::
``Lexicator``/``caches`` dict [M], SURVEY.md §3.1).

Each stage is a pure ``DataFrame → DataFrame`` function whose output
is persisted as a stage table; resumability = checking the stage's
``_SUCCESS``-backed checkpoint marker before recomputing (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Lineage rows: (stage, rows_in, rows_out, wall_ms, n_partitions) are
appended to ``<root>/_lineage`` (an ordinary Spark-written table);
checkpoint markers are tiny JSON files under ``<root>/_checkpoints``
written through the Hadoop FileSystem of ``out_root`` — so resume
works identically whether ``out_root`` is local disk, HDFS, or an
object store (FIXTURES.md §4 schemas).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lexicator_spark.sources import fsutil

from lexicator_spark.operators.canonicalize import (
    canonical_of_triples,
    connected_components,
)
from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.operators.link import build_catalog, link_mentions
from lexicator_spark.sources import io as sio
from lexicator_spark import rules


@dataclass
class PipelineResult:
    triples_path: str
    entities_path: str
    lineage: list[dict]
    stages_run: list[str]
    stages_skipped: list[str]


def _ckpt_path(root: str, stage: str) -> str:
    return os.path.join(root, "_checkpoints", f"{stage}.json")


def _mark_done(spark: SparkSession, root: str, stage: str, meta: dict) -> None:
    fsutil.write_text(
        spark,
        _ckpt_path(root, stage),
        json.dumps({"stage": stage, "status": "done", **meta}),
    )


def _is_done(spark: SparkSession, root: str, stage: str) -> bool:
    return fsutil.exists(spark, _ckpt_path(root, stage))


def _append_lineage(spark: SparkSession, root: str, row: dict) -> None:
    # built from JVM literals, NOT createDataFrame([...]): a
    # Python-list-backed frame spins up a Python worker per default
    # slice just to write one row (~5 s per append at local[32])
    df = spark.range(1).select(
        F.lit(row["stage"]).alias("stage"),
        F.lit(-1).cast("int").alias("partition_id"),  # -1 = stage-level
        F.lit(row["rows_in"]).cast("bigint").alias("rows_in"),
        F.lit(row["rows_out"]).cast("bigint").alias("rows_out"),
        F.lit(row["wall_ms"]).cast("bigint").alias("wall_ms"),
        F.lit(row["n_partitions"]).cast("int").alias("n_partitions"),
    )
    df.coalesce(1).write.mode("append").parquet(os.path.join(root, "_lineage"))


def _append_partition_lineage(
    spark: SparkSession, root: str, stage: str, out_path: str, n_partitions: int
) -> None:
    """Per-partition lineage rows (FIXTURES.md §4 / north_rule
    'per-partition lineage + metrics'): one row per p_hash bucket with
    its row count — derived from parquet footer statistics of the
    just-written stage table, entirely JVM-side (no driver collect)."""
    raw = spark.read.parquet(out_path)
    if "p_hash" not in raw.columns:
        return
    per_part = raw.groupBy("p_hash").count().select(
        F.lit(stage).alias("stage"),
        F.col("p_hash").cast("int").alias("partition_id"),
        F.lit(-1).cast("bigint").alias("rows_in"),
        F.col("count").cast("bigint").alias("rows_out"),
        F.lit(-1).cast("bigint").alias("wall_ms"),
        F.lit(n_partitions).cast("int").alias("n_partitions"),
    )
    per_part.coalesce(1).write.mode("append").parquet(
        os.path.join(root, "_lineage")
    )


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    out_root: str,
    resume: bool = True,
    impl: str = "native",
    n_buckets: int = sio.DEFAULT_BUCKETS,
    lineage_input_counts: bool = True,
) -> PipelineResult:
    """Run (or resume) the full KG-construction pipeline.

    ``lineage_input_counts=False`` records -1 for ``rows_in`` instead
    of counting each stage's input: stage inputs that are persisted
    parquet count from footer metadata (cheap), but a raw CSV/JSON
    turns source would be re-parsed end to end just for the lineage
    row — disable it there.

    Stage tables under ``out_root``:
      triples_raw/   Stage A output (+ rejects/ error channel)
      triples/       A + same_as + canonical_of, final graph edges
      entities/      canonical_id → surface_form rows
    """
    lineage: list[dict] = []
    run: list[str] = []
    skipped: list[str] = []

    def staged(name: str, in_df: DataFrame | None, fn, out_path: str, partition_key):
        if resume and _is_done(spark, out_root, name):
            skipped.append(name)
            return sio.read_table(spark, out_path)
        t0 = time.monotonic()
        out_df = fn()
        sio.write_table(out_df, out_path, partition_key=partition_key, n_buckets=n_buckets)
        persisted = sio.read_table(spark, out_path)
        rows_out = persisted.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        row = {
            "stage": name,
            "rows_in": (
                in_df.count()
                if in_df is not None and lineage_input_counts
                else -1
            ),
            "rows_out": rows_out,
            "wall_ms": wall_ms,
            "n_partitions": persisted.rdd.getNumPartitions(),
        }
        lineage.append(row)
        _append_lineage(spark, out_root, row)
        _append_partition_lineage(
            spark, out_root, name, out_path, row["n_partitions"]
        )
        _mark_done(spark, out_root, name, {"rows_out": rows_out, "wall_ms": wall_ms})
        run.append(name)
        return persisted

    raw_path = os.path.join(out_root, "triples_raw")
    triples_path = os.path.join(out_root, "triples")
    entities_path = os.path.join(out_root, "entities")

    # Stage A — extraction.  The extracted frame feeds two writes
    # (rejects + good); persist for the stage's duration so the scan +
    # rule evaluation runs once, not once per sink.
    stage_a_cache: list[DataFrame] = []

    def stage_a():
        from pyspark import StorageLevel

        extracted = extract_triples(turns, impl=impl).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        stage_a_cache.append(extracted)
        good, rejects = split_rejects(extracted)
        sio.write_table(rejects, os.path.join(out_root, "rejects"), partition_key=None)
        return good

    triples_a = staged("extract", turns, stage_a, raw_path, "conv_id")
    for cached in stage_a_cache:
        cached.unpersist()

    # Stage B — linking
    def stage_b():
        catalog = build_catalog(spark)
        return link_mentions(triples_a, catalog)

    same_as = staged("link", triples_a, stage_b, os.path.join(out_root, "same_as"), None)

    # Stage C — canonicalization
    def stage_c():
        edges = same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
        assignments = connected_components(edges)
        return canonical_of_triples(assignments)

    canonical = staged("canonicalize", same_as, stage_c, os.path.join(out_root, "canonical"), None)

    # Stage D — materialize final graph tables
    def stage_d():
        return triples_a.unionByName(same_as).unionByName(canonical)

    staged("materialize", None, stage_d, triples_path, "conv_id")

    def stage_entities():
        """Entity dimension table (FIXTURES.md §4): one row per
        (canonical_id, member surface), carrying the Stage-B link
        score, the blocking key, and corpus mention counts — the
        flattened analog of the reference's lexeme-entity record
        (SURVEY §1.1: nested claims → triples + entities dimension)."""
        members = (
            canonical.select(
                F.col("obj").alias("canonical_id"), F.col("subj").alias("surface_form")
            )
            .union(
                canonical.select(
                    F.col("obj").alias("canonical_id"), F.col("obj").alias("surface_form")
                )
            )
            .distinct()
        )
        link_scores = same_as.select(
            F.col("subj").alias("surface_form"), F.col("conf").alias("score")
        )
        # per-surface corpus aggregates ride the same single shuffle
        # as the mention count — n_convs / first-last seen make this
        # the dimension table analytics queries join without going
        # back to the fact table (extracted_at is the source turn ts)
        mention_counts = (
            triples_a.filter(F.col("pred") == rules.PRED_MENTIONS)
            .groupBy(F.col("obj").alias("surface_form"))
            .agg(
                F.count(F.lit(1)).alias("n_mentions"),
                F.countDistinct("conv_id").alias("n_convs"),
                F.min("extracted_at").alias("first_seen"),
                F.max("extracted_at").alias("last_seen"),
            )
        )
        from lexicator_spark.operators.link import _block_key

        return (
            members.join(link_scores, "surface_form", "left")
            .join(mention_counts, "surface_form", "left")
            .select(
                "canonical_id",
                "surface_form",
                _block_key(F.col("surface_form")).alias("block_key"),
                # canonical members carry score 1.0 by identity
                F.coalesce(
                    F.col("score"),
                    F.when(F.col("surface_form") == F.col("canonical_id"), 1.0),
                ).alias("score"),
                F.coalesce(F.col("n_mentions"), F.lit(0)).alias("n_mentions"),
                F.coalesce(F.col("n_convs"), F.lit(0)).alias("n_convs"),
                F.col("first_seen"),
                F.col("last_seen"),
                (F.col("surface_form") == F.col("canonical_id")).alias("is_canonical"),
            )
        )

    staged("entities", None, stage_entities, entities_path, None)

    return PipelineResult(
        triples_path=triples_path,
        entities_path=entities_path,
        lineage=lineage,
        stages_run=run,
        stages_skipped=skipped,
    )


def triples_of(spark: SparkSession, out_root: str) -> DataFrame:
    return sio.read_table(spark, os.path.join(out_root, "triples"))
