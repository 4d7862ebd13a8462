"""Storage-seam routing tests: path-vs-catalog discrimination, the
Iceberg writeTo/read.table branch (structurally exercised with a
stubbed catalog — the runtime jar is absent in the sandbox), and the
empty-bucket semantics of the partition upsert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lexicator_spark.sources import io as sio


def test_is_path_discrimination():
    # paths: URIs, absolute, anything with a separator
    for p in (
        "/abs/path", "s3a://bucket/key", "hdfs://nn/t", "file:/x",
        "./rel", "../up", "out/triples", "a/b.parquet",
    ):
        assert sio._is_path(p), p
    # catalog identifiers: bare (possibly dotted) names only
    for t in ("triples", "glacier.triples", "cat.db.table"):
        assert not sio._is_path(t), t


def test_iceberg_branch_routing(spark, monkeypatch, tmp_path):
    """With a catalog 'available', table NAMES route to writeTo()/
    read.table() and PATHS still route to parquet — the exact decision
    io.py makes on a real deployment, minus the jar."""
    calls = {}

    class FakeWriter:
        def __init__(self, loc):
            self.loc = loc

        def createOrReplace(self):
            calls["write"] = ("createOrReplace", self.loc)

        def append(self):
            calls["write"] = ("append", self.loc)

    monkeypatch.setattr(sio, "iceberg_available", lambda s: True)
    df = spark.range(3).toDF("x")
    # patch the CONCRETE class (pyspark.sql.classic.DataFrame in Spark
    # 4) — the pyspark.sql.DataFrame base's method is shadowed by it
    monkeypatch.setattr(type(df), "writeTo", lambda self, loc: FakeWriter(loc))

    sio.write_table(df, "glacier.triples", mode="overwrite", partition_key=None)
    assert calls["write"] == ("createOrReplace", "glacier.triples")
    sio.write_table(df, "glacier.triples", mode="append", partition_key=None)
    assert calls["write"] == ("append", "glacier.triples")

    # a filesystem path bypasses the catalog even when one is configured
    out = str(tmp_path / "plain")
    sio.write_table(df, out, partition_key=None)
    assert calls["write"][1] == "glacier.triples"  # unchanged — not writeTo
    assert sio.read_table(spark, out).count() == 3

    seen = {}

    def fake_table(self, name):
        seen["table"] = name
        return df

    monkeypatch.setattr(type(spark.read), "table", fake_table)
    got = sio.read_table(spark, "glacier.triples")
    assert seen["table"] == "glacier.triples" and got.count() == 3


def test_upsert_deletes_emptied_touched_buckets(spark, tmp_path):
    """Dynamic partition overwrite cannot express 'bucket became
    empty'; upsert_partitions deletes touched buckets absent from the
    replacement so deleted rows cannot resurface."""
    loc = str(tmp_path / "tbl")
    n_buckets = 8
    df = spark.createDataFrame(
        [(f"c{i}", i) for i in range(40)], "conv_id string, v int"
    )
    sio.write_table(df, loc, partition_key="conv_id", n_buckets=n_buckets)

    bucket_of = {
        r.conv_id: r.b
        for r in df.select(
            "conv_id",
            F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int").alias("b"),
        ).collect()
    }
    victim_bucket = bucket_of["c0"]
    keep_bucket = next(b for b in bucket_of.values() if b != victim_bucket)
    survivors = [c for c, b in bucket_of.items() if b == keep_bucket]

    # replacement covers BOTH buckets but only has rows for one — the
    # victim bucket's rows were all 'deleted'
    replacement = df.filter(F.col("conv_id").isin(survivors))
    sio.upsert_partitions(
        replacement, loc, partition_key="conv_id", n_buckets=n_buckets,
        touched_buckets=[victim_bucket, keep_bucket],
    )
    back = {r.conv_id for r in sio.read_table(spark, loc).collect()}
    gone = {c for c, b in bucket_of.items() if b == victim_bucket}
    untouched = {c for c, b in bucket_of.items() if b not in (victim_bucket, keep_bucket)}
    assert back == untouched | set(survivors)
    assert not (back & gone)
    assert not os.path.exists(os.path.join(loc, f"p_hash={victim_bucket}"))

    # without touched_buckets the seam keeps its old conservative
    # behavior: nothing beyond the buckets present in df is modified
    sio.upsert_partitions(
        replacement, loc, partition_key="conv_id", n_buckets=n_buckets
    )
    assert {r.conv_id for r in sio.read_table(spark, loc).collect()} == back


def test_upsert_files_per_bucket_salted_layout(spark, tmp_path):
    """files_per_bucket=k spreads a bucket's rewrite over ≤ k salted
    files (k writer tasks instead of 1) with identical content, and
    the salt is deterministic: rewriting the same rows reproduces the
    same file layout."""
    from lexicator_spark import synth

    df = synth.corpus_df(spark, synth.make_corpus(n_convs=40, seed=47))
    loc = str(tmp_path / "t")
    n_buckets = 2  # few buckets, many rows per bucket

    def files_of(bucket):
        d = os.path.join(loc, f"p_hash={bucket}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        ) if os.path.isdir(d) else []

    sio.upsert_partitions(df, loc, partition_key="conv_id",
                          n_buckets=n_buckets, files_per_bucket=4)
    rows = {tuple(r) for r in sio.read_table(spark, loc).collect()}
    assert rows == {tuple(r) for r in df.collect()}
    counts = [len(files_of(b)) for b in range(n_buckets)]
    assert all(1 <= c <= 4 for c in counts)
    assert any(c > 1 for c in counts), counts  # the salt actually splits

    # default stays one file per bucket dir (small-file discipline)
    loc1 = str(tmp_path / "t1")
    sio.upsert_partitions(df, loc1, partition_key="conv_id",
                          n_buckets=n_buckets)
    for b in range(n_buckets):
        d = os.path.join(loc1, f"p_hash={b}")
        n = len([f for f in os.listdir(d) if f.endswith(".parquet")])
        assert n == 1, (b, n)
