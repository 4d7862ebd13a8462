"""Diagnostic: same-JVM drift across repeated refresh invocations.

bench.py runs eight refresh invocations in one JVM and its LAST rows
(feed mode) read slower than earlier detection rows despite doing
strictly less work.  This probe interleaves detection- and feed-mode
sparse refreshes in a fresh JVM over the cached bench corpus: if the
modes are equivalent and walls climb with invocation count in BOTH,
the bench delta is accumulated JVM/checkpoint state, not a feed-mode
defect (result recorded in BENCH/BASELINE.md).  Requires
/tmp/bench_kg_corpus_300000 (created by a bench.py run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from lexicator_spark.session import get_spark
from lexicator_spark.operators.extract import extract_triples, split_rejects
from lexicator_spark.operators.incremental import refresh_triples_partitioned, materialize_frontier
from lexicator_spark.sources import io as sio
import shutil

spark = get_spark(master="local[32]", app_name="probe", shuffle_partitions=32)
turns = spark.read.parquet("/tmp/bench_kg_corpus_300000")
raw = "/tmp/probe_feed_raw"
shutil.rmtree(raw, ignore_errors=True)
good, _ = split_rejects(extract_triples(turns))
sio.write_table(good, raw, partition_key="conv_id")
materialize_frontier(spark, turns, raw)
last = (turns.withColumn("rn", F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))))
        .filter("rn=1").drop("rn"))
turns_now = turns
for i, (mod, mode) in enumerate([(2,"detect"),(3,"detect"),(4,"feed"),(5,"feed"),(6,"feed"),(7,"detect")]):
    extra = last.filter(F.pmod(F.xxhash64("conv_id"), F.lit(30000)) == mod).withColumn("turn_idx", F.col("turn_idx")+1)
    feed = extra.select("conv_id").distinct().localCheckpoint(eager=True)
    turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
    t0 = time.monotonic()
    res = refresh_triples_partitioned(spark, turns_now, raw, change_feed=feed if mode=="feed" else None)
    print(f"PROBE {i} mode={mode} mod={mod} n={res.n_changed} buckets={res.n_buckets_touched} wall={time.monotonic()-t0:.2f}", flush=True)
spark.stop()
