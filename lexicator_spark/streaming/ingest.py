"""Structured-Streaming ingest: incremental triple extraction.

The streaming twin of the batch pipeline — the Spark re-design of
lexicator's RecentChanges incremental refresh (SURVEY.md §2 #2,
``ContentStore.refresh`` [M]): instead of polling a changes feed, new
transcript files/snapshots arrive on a stream and flow through the
SAME batch stage functions via ``foreachBatch`` (preferred over
custom stateful operators: one code path, exactly-once via idempotent
MERGE-style writes).

Also provides the watermarked windowed aggregation used for
freshness/metrics dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lexicator_spark.operators.extract import extract_triples, split_rejects

TURN_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def stream_turns(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript turns (schema declared, never
    inferred).  In production this is an Iceberg/Kafka source; the
    transformation graph is identical."""
    return (
        spark.readStream.schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def start_extract_stream(
    turns_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """readStream → Stage-A extraction → append sink, batch-stage code
    reused inside foreachBatch.  NOTE: ``replies_to`` needs the
    previous turn, which may sit in an earlier micro-batch; the batch
    recompute over the stage table (run_pipeline) remains the source
    of truth — the stream gives low-latency provisional triples."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        good, _rejects = split_rejects(extract_triples(batch_df))
        (
            good.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        turns_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sessionize(
    events_stream: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``operators.asof.sessionize``: Spark's native
    ``session_window`` aggregation — sessions merge while consecutive
    events are less than ``gap_minutes`` apart, close once the
    watermark passes the session end, and state is evicted by the
    engine (no unbounded keys).  Emits one row per closed session:
    (by, session_start, session_end, n_events).

    Boundary semantics: an event at EXACTLY ``gap_minutes`` after its
    predecessor starts a new session here ([start, end) windows),
    while the batch formulation keeps it (strict ``>`` gap test) —
    equality between the two holds for corpora without exact-gap
    timestamps (asserted in tests/test_salting_streaming_mm.py)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
            F.col(by),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(by),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_turn_counts(turns_stream: DataFrame) -> DataFrame:
    """Watermarked sliding-window turn counts per role — late rows
    beyond 10 minutes are dropped deterministically."""
    return (
        turns_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("role"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("window.start").alias("bucket"), "role", "n_turns")
    )
