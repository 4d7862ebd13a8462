"""SparkSession factory with the scale-oriented defaults the engine
assumes everywhere (AQE, Arrow, UTC, skew-join handling).

In the sandbox this is ``local[N]`` (one JVM); on a real cluster the
same builder is used by ``spark-submit --py-files`` with master /
memory supplied externally — nothing here hard-codes local mode
except the explicit ``master`` argument tests pass.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "lexicator_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; on a cluster, caller sets this to ~2-3× total cores
        shuffle_partitions = (
            int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit()
            else cpus
        )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to Python workers (the --py-files story) so UDF
    # closures resolve lexicator_spark.* regardless of driver cwd
    from lexicator_spark.submit import ship_package

    ship_package(spark)
    return spark
