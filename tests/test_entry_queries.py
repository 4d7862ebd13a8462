"""Driver-contract parity: every queries() entry with an oracle_sql()
twin must match DuckDB exactly at sf0.001 (the driver re-checks at
sf0.01; scripts/check_oracle.py runs either)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from scripts.check_oracle import compare, compare_pair, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(name, spark, con):
    ok, msg = compare(name, spark, con, SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(entrymod.retired_oracles()))
def test_retired_query_matches_oracle(name, spark, con):
    """Queries retired from the driver snapshot (registry budget)
    keep their exact DuckDB comparison here — retirement narrows the
    driver-visible surface, never the verification surface."""
    fn, sql = entrymod.retired_oracles()[name]
    ok, msg = compare_pair(fn, sql, spark, con, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["term", "lang_pred", "n_mentions", "n_docs"]


def test_every_query_has_oracle_or_reason(spark):
    """Every queries() key either has an oracle or is one of the
    documented non-SQL-expressible ops."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    rows_only = qs - os_
    assert rows_only == {
        "dedup_minhash_clusters",
        "ann_lsh_top1",
        "approx_aggs",
        "multimodal_features",
        "kg_pagerank_top",  # iterative — not recursive-CTE-expressible
    }


def test_registry_fits_driver_snapshot():
    """The driver's correctness snapshot holds ~50 rows; every
    registered query must be driver-visible (the r3 registry had 61
    entries and 11 green queries silently rotated out)."""
    assert len(entrymod.queries()) <= 50


def test_synth_fixture_matches_generator(spark):
    """The committed parquet fixture the synth-corpus KG oracles read
    must equal a fresh regeneration of synth.make_corpus(300, seed=42)
    — otherwise the Spark side (reads the fixture) and the intended
    semantics (the generator) could drift silently."""
    from lexicator_spark import synth

    fresh = synth.make_corpus(n_convs=300, seed=42)
    expected = {
        (c, t, r, x, tl, ts.isoformat()) for c, t, r, x, tl, ts in fresh.rows
    }
    got = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts.isoformat())
        for r in spark.read.parquet(entrymod._SYNTH_FIXTURE).collect()
    }
    assert got == expected


def test_approx_aggs_within_bounds(spark):
    """Sketch outputs have no SQL oracle; assert accuracy bounds vs
    exact values instead."""
    import duckdb

    got = {
        r.l_returnflag: r
        for r in entrymod.queries()["approx_aggs"](spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT l_returnflag, count(DISTINCT l_partkey) AS d,
                   median(l_extendedprice) AS p50
            FROM read_parquet('{SF_DIR}/lineitem.parquet') GROUP BY 1"""
    ).fetchall()
    for flag, d, p50 in exact:
        r = got[flag]
        assert abs(r.approx_parts - d) / d < 0.1, (flag, r.approx_parts, d)
        assert abs(r.p50_price - p50) / p50 < 0.1, (flag, r.p50_price, p50)
