"""Capture the refresh detection subtree's physical plan before/after
the r6 union-aggregate rewrite (plans/r06/refresh_detection_*.txt).

The detection frame is not a registry query, so this builds it the
way refresh_triples_partitioned does: a turns snapshot vs a frontier
table, r5 shape (aggregate + left join) and r6 shape (union
aggregate), and explains both.  Run against the CURRENT tree — both
shapes are reconstructed here verbatim so the capture does not depend
on checking out the old code.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lexicator_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
os.makedirs(OUT, exist_ok=True)

spark = get_spark(master="local[8]", shuffle_partitions=8)
turns = spark.read.parquet("/tmp/bench_kg_corpus_300000")
frontier = turns.groupBy("conv_id").agg(F.max("turn_idx").alias("done_max_idx"))
frontier.write.mode("overwrite").parquet("/tmp/plan_frontier")
frontier = spark.read.parquet("/tmp/plan_frontier")

# r5 shape: aggregate + left join
latest = turns.groupBy("conv_id").agg(F.max("turn_idx").alias("max_idx"))
before = (
    latest.join(frontier, "conv_id", "left")
    .filter(
        F.col("done_max_idx").isNull()
        | (F.col("max_idx") > F.col("done_max_idx"))
    )
    .select("conv_id", "max_idx")
)

# r6 shape: one union aggregate (verbatim from incremental.py)
merged = (
    turns.select("conv_id", F.col("turn_idx").alias("idx"), F.lit(True).alias("live"))
    .unionByName(
        frontier.select(
            "conv_id", F.col("done_max_idx").alias("idx"), F.lit(False).alias("live")
        )
    )
    .groupBy("conv_id")
    .agg(
        F.max(F.when(F.col("live"), F.col("idx"))).alias("max_idx"),
        F.max(F.when(~F.col("live"), F.col("idx"))).alias("done_max_idx"),
    )
)
after = merged.filter(
    F.col("max_idx").isNotNull()
    & (F.col("done_max_idx").isNull() | (F.col("max_idx") > F.col("done_max_idx")))
).select("conv_id", "max_idx")

for name, df in (("refresh_detection_before", before), ("refresh_detection_after", after)):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("wrote", name)
spark.stop()
