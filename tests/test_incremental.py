"""Incremental refresh (RecentChanges analog) tests."""

from __future__ import annotations

import os

from lexicator_spark import synth
from lexicator_spark.operators.extract import extract_triples
from lexicator_spark.operators.incremental import (
    changed_conversations,
    extract_incremental,
    refresh_triples,
    refresh_triples_partitioned,
)
from lexicator_spark.sources import io as sio


def _tset(df):
    return {
        (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx)
        for r in df.select("subj", "pred", "obj", "conv_id", "turn_idx").collect()
    }


def test_incremental_refresh_equals_full_recompute(spark):
    full_corpus = synth.make_corpus(n_convs=50, seed=33, shuffled=False)
    # v1 = drop the last turn of every 3rd conversation + drop every
    # 7th conversation entirely → those convs are "changed/new" in v2
    v1_rows = [
        r
        for r in full_corpus.rows
        if not (int(r[0][1:]) % 7 == 0)
        and not (
            int(r[0][1:]) % 3 == 0
            and r[1] == max(x[1] for x in full_corpus.rows if x[0] == r[0])
        )
    ]
    v1 = synth.corpus_df(spark, synth.Corpus(rows=v1_rows))
    v2 = synth.corpus_df(spark, full_corpus)

    done = extract_triples(v1).localCheckpoint()
    changed = {r.conv_id for r in changed_conversations(v2, done).collect()}
    expected = {
        c for c in {r[0] for r in full_corpus.rows}
        if int(c[1:]) % 7 == 0 or int(c[1:]) % 3 == 0
    }
    # every truly changed conv is detected; the only extras allowed are
    # convs with zero triples in the stage table (no frontier row →
    # re-derived as a no-op, documented in operators/incremental.py)
    assert expected <= changed
    with_triples = {r.conv_id for r in done.select("conv_id").distinct().collect()}
    assert all(c not in with_triples for c in changed - expected)

    refreshed = refresh_triples(v2, done)
    assert _tset(refreshed) == _tset(extract_triples(v2))


def _file_state(root):
    """(relpath → (mtime, size)) for every parquet data file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(dirpath, fn)
                out[os.path.relpath(p, root)] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_partitioned_refresh_upserts_only_touched_buckets(spark, tmp_path):
    """The parquet MERGE-INTO stand-in: refresh equals a full
    recompute, buckets without changed conversations keep their exact
    files on disk, and a refresh with no new turns rewrites nothing."""
    from pyspark.sql import functions as F

    n_buckets = 8
    full_corpus = synth.make_corpus(n_convs=60, seed=7, shuffled=False)
    v1_rows = [
        r
        for r in full_corpus.rows
        if not (int(r[0][1:]) % 5 == 0)
        and not (
            int(r[0][1:]) % 3 == 0
            and r[1] == max(x[1] for x in full_corpus.rows if x[0] == r[0])
        )
    ]
    v1 = synth.corpus_df(spark, synth.Corpus(rows=v1_rows))
    v2 = synth.corpus_df(spark, full_corpus)
    loc = str(tmp_path / "triples_raw")
    sio.write_table(extract_triples(v1), loc, partition_key="conv_id", n_buckets=n_buckets)
    before = _file_state(loc)

    res = refresh_triples_partitioned(spark, v2, loc, n_buckets=n_buckets)
    assert _tset(res.table) == _tset(extract_triples(v2))
    assert res.n_changed > 0 and res.n_buckets_touched > 0

    changed_ids = sorted(
        {c for c in {r[0] for r in full_corpus.rows} if int(c[1:]) % 5 == 0 or int(c[1:]) % 3 == 0}
    )
    touched = {
        r.p
        for r in spark.createDataFrame([(c,) for c in changed_ids], "conv_id string")
        .select(F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int").alias("p"))
        .collect()
    }
    assert touched and len(touched) < n_buckets, "fixture must leave untouched buckets"
    after = _file_state(loc)
    for rel, meta in before.items():
        bucket = int(rel.split("p_hash=")[1].split(os.sep)[0])
        if bucket not in touched:
            assert after.get(rel) == meta, f"untouched bucket file rewritten: {rel}"

    # idempotent: refreshing again with the same turns touches no files
    stable = _file_state(loc)
    again = refresh_triples_partitioned(spark, v2, loc, n_buckets=n_buckets)
    assert _file_state(loc) == stable
    assert again.n_changed == 0 and again.n_buckets_touched == 0
    assert _tset(again.table) == _tset(res.table)

    # bucketing is recorded in the sidecar: a contradicting n_buckets
    # is refused instead of silently scattering rows
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        refresh_triples_partitioned(spark, v2, loc, n_buckets=16)
    # and omitting it uses the recorded value
    auto = refresh_triples_partitioned(spark, v2, loc)
    assert auto.n_changed == 0


def test_incremental_noop_when_nothing_changed(spark):
    corpus = synth.make_corpus(n_convs=20, seed=5)
    turns = synth.corpus_df(spark, corpus)
    done = extract_triples(turns).localCheckpoint()
    assert extract_incremental(turns, done).count() == 0
    assert _tset(refresh_triples(turns, done)) == _tset(done)


def test_read_turns_jsonl_and_csv_equal_parquet(spark, tmp_path):
    """Raw-log ingestion: the same corpus through JSONL / CSV / parquet
    yields identical turn rows (declared schema, explicit ts parse)."""
    from pyspark.sql import functions as F

    from lexicator_spark.sources.io import read_turns

    corpus = synth.make_corpus(n_convs=15, seed=11)
    df = synth.corpus_df(spark, corpus)
    p_parquet = str(tmp_path / "t.parquet")
    p_orc = str(tmp_path / "t.orc")
    p_json = str(tmp_path / "t.jsonl")
    p_csv = str(tmp_path / "t.csv")
    df.write.parquet(p_parquet)
    df.write.orc(p_orc)
    df.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")).write.json(p_json)
    df.withColumn("ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")).write.option(
        "header", "true"
    ).csv(p_csv)

    def rows(d):
        return {tuple(r) for r in d.collect()}

    base = rows(read_turns(spark, p_parquet))
    assert rows(read_turns(spark, p_orc, "orc")) == base
    assert rows(read_turns(spark, p_json, "json")) == base
    assert rows(read_turns(spark, p_csv, "csv")) == base
    assert base and len(base) == len(corpus.rows)
