"""Characterize stream_replies_buffered (VERDICT r5 item 3): where do
the ~11 s go — micro-batch scheduling, Python state handling, or the
state store?  Runs the bench's exact stream (same input layout,
maxFilesPerTrigger=6, availableNow, noop sink) under conf variants
and reports per-micro-batch walls from the streaming query progress.

Usage: python scripts/bench_r06_stream.py [variant ...]
variants: base rocksdb
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lexicator_spark import synth  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402

CORPUS = os.environ.get("BENCH_KG_CORPUS", "/tmp/bench_kg_corpus_300000")

VARIANTS = {
    "base": {},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    },
}


def prep_input(spark):
    turns_df = spark.read.parquet(CORPUS)
    stream_in = "/tmp/bench_stream_in"
    sub = turns_df.filter(F.pmod(F.xxhash64("conv_id"), F.lit(10)) == 0)
    if not os.path.exists(os.path.join(stream_in, "_ready")):
        shutil.rmtree(stream_in, ignore_errors=True)
        sub.repartition(11).write.parquet(stream_in)
        far = synth.EPOCH + timedelta(days=90)
        for i, ts in enumerate((far, far + timedelta(days=1))):
            staging = f"/tmp/probe_stream_sentinel_{i}"
            shutil.rmtree(staging, ignore_errors=True)
            synth.corpus_df(
                spark,
                synth.Corpus(rows=[("wm_sentinel", i, "user", "advance", None, ts)]),
            ).coalesce(1).write.parquet(staging)
            part = glob.glob(staging + "/part-*.parquet")[0]
            dst = os.path.join(stream_in, f"zz_sentinel_{i}.parquet")
            shutil.copy(part, dst)
            t = time.time() + 100 + i
            os.utime(dst, (t, t))
            shutil.rmtree(staging, ignore_errors=True)
        open(os.path.join(stream_in, "_ready"), "w").close()
    return stream_in, sub.count()


def run_variant(name, extra_conf):
    from lexicator_spark.streaming import ingest

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name=f"stream_probe_{name}",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf=extra_conf,
    )
    stream_in, n = prep_input(spark)
    ckpt = "/tmp/probe_stream_ckpt"
    walls = []
    progress = None
    for _ in range(2):
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
        t0 = time.monotonic()
        assert q.awaitTermination(600)
        walls.append(round(time.monotonic() - t0, 3))
        progress = [json.loads(p.json) for p in q.recentProgress]
    print(f"== {name}: wall min={min(walls)} runs={walls} rows={n}")
    for p in progress:
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        print(
            f"  batch {p['batchId']}: rows={p.get('numInputRows')} "
            f"total={d.get('triggerExecution')}ms addBatch={d.get('addBatch')}ms "
            f"getBatch={d.get('getBatch')}ms latestOffset={d.get('latestOffset')}ms "
            f"commit={d.get('commitOffsets')}ms "
            f"stateRows={so.get('numRowsTotal')} "
            f"stateUpd={so.get('allUpdatesTimeMs')}ms stateRm={so.get('allRemovalsTimeMs')}ms "
            f"stateCommit={so.get('commitTimeMs')}ms"
        )
    spark.stop()


def main():
    names = sys.argv[1:] or ["base"]
    for name in names:
        run_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
