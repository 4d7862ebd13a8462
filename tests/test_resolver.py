"""External-resolver seam tests: micro-batched resolution, result
cache (including tombstones), and the static-first fallback wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexicator_spark import rules, synth
from lexicator_spark.operators.extract import extract_triples
from lexicator_spark.operators.link import build_catalog, link_mentions
from lexicator_spark.operators.resolver import (
    link_with_external_fallback,
    resolve_surfaces,
)

_KB = {
    "external entity one": ("Q_ext1", 0.9),
    "external entity two": ("Q_ext2", 0.8),
}


def _kb_resolver(surfaces):
    return [_KB.get(s, (None, 0.0)) for s in surfaces]


def _raising_resolver(surfaces):
    raise AssertionError(f"resolver must not be called, got {surfaces}")


def _surfaces(spark, names):
    return spark.createDataFrame([(n,) for n in names], "surface string")


def test_resolve_surfaces_no_cache(spark):
    out = {
        (r.surface, r.canonical_id, r.resolve_conf)
        for r in resolve_surfaces(
            spark,
            _surfaces(spark, ["external entity one", "unknown thing"]),
            _kb_resolver,
        ).collect()
    }
    assert out == {
        ("external entity one", "Q_ext1", 0.9),
        ("unknown thing", None, 0.0),
    }


def test_resolver_cache_serves_repeats_and_tombstones(spark, tmp_path):
    cache = str(tmp_path / "resolve_cache")
    names = ["external entity one", "external entity two", "unknown thing"]
    first = {
        (r.surface, r.canonical_id)
        for r in resolve_surfaces(
            spark, _surfaces(spark, names), _kb_resolver, cache
        ).collect()
    }
    assert first == {
        ("external entity one", "Q_ext1"),
        ("external entity two", "Q_ext2"),
        ("unknown thing", None),
    }
    # every surface (including the tombstoned miss) now comes from the
    # cache: a resolver that raises proves nothing re-resolves
    second = {
        (r.surface, r.canonical_id)
        for r in resolve_surfaces(
            spark, _surfaces(spark, names), _raising_resolver, cache
        ).collect()
    }
    assert second == first
    # a NEW surface still reaches the resolver
    with pytest.raises(Exception):
        resolve_surfaces(
            spark, _surfaces(spark, ["brand new"]), _raising_resolver, cache
        ).collect()


def test_resolver_cache_duplicates_do_not_fan_out(spark, tmp_path):
    """Append-mode retries / concurrent writers can duplicate surface
    rows in the cache; only the newest row per surface is used, so the
    hits join emits exactly one row per requested surface."""
    cache = str(tmp_path / "dup_cache")
    names = ["external entity one"]
    resolve_surfaces(spark, _surfaces(spark, names), _kb_resolver, cache).collect()
    # simulate a retried append: same surface cached twice
    resolved = spark.createDataFrame(
        [("external entity one", "Q_ext1", 0.9)],
        "surface string, canonical_id string, resolve_conf double",
    ).withColumn("resolved_at", F.current_timestamp())
    from lexicator_spark.sources import io as sio

    sio.write_table(resolved, cache, mode="append", partition_key=None)
    out = resolve_surfaces(
        spark, _surfaces(spark, names), _raising_resolver, cache
    ).collect()
    assert len(out) == 1 and out[0].canonical_id == "Q_ext1"


def test_resolver_tombstone_ttl_retries_expired_misses(spark, tmp_path):
    """A tombstoned miss is retried once its TTL expires — an external
    KB that has since learned the surface gets linked; positive cache
    entries never expire."""
    cache = str(tmp_path / "ttl_cache")
    names = ["external entity one", "late arrival"]
    first = {
        (r.surface, r.canonical_id)
        for r in resolve_surfaces(
            spark, _surfaces(spark, names), _kb_resolver, cache
        ).collect()
    }
    assert ("late arrival", None) in first
    # KB learns the surface; with ttl=0 every tombstone is expired.
    # The resolver RAISES on anything but the expired miss (it runs in
    # an executor, so behavior — not a driver-side spy — is the proof
    # that positives were served from cache and only the tombstone
    # reached it).
    def learned_resolver(surfaces):
        assert list(surfaces) == ["late arrival"], surfaces
        return [("Q_late", 0.7)] * len(surfaces)

    second = {
        (r.surface, r.canonical_id)
        for r in resolve_surfaces(
            spark, _surfaces(spark, names), learned_resolver, cache,
            tombstone_ttl_minutes=0,
        ).collect()
    }
    assert second == {("external entity one", "Q_ext1"), ("late arrival", "Q_late")}
    # the retried result replaced the tombstone: a later TTL-less read
    # serves Q_late from cache (raising resolver proves no re-resolve)
    third = {
        (r.surface, r.canonical_id)
        for r in resolve_surfaces(
            spark, _surfaces(spark, names), _raising_resolver, cache
        ).collect()
    }
    assert third == second


def test_resolver_no_misses_skips_cache_append(spark, tmp_path):
    """A re-run with zero misses must not touch the cache table at all
    (no empty file-set append, no sidecar rewrite)."""
    import pathlib

    cache = str(tmp_path / "stable_cache")
    names = ["external entity one", "unknown thing"]
    resolve_surfaces(spark, _surfaces(spark, names), _kb_resolver, cache).collect()
    snapshot = {
        p.name: (p.stat().st_size, p.stat().st_mtime_ns)
        for p in pathlib.Path(cache).rglob("*")
        if p.is_file()
    }
    resolve_surfaces(
        spark, _surfaces(spark, names), _raising_resolver, cache
    ).collect()
    after = {
        p.name: (p.stat().st_size, p.stat().st_mtime_ns)
        for p in pathlib.Path(cache).rglob("*")
        if p.is_file()
    }
    assert after == snapshot


def test_link_with_external_fallback(spark, tmp_path):
    rows = [
        ("c0", 0, "user", "we use Spark and [[external entity one]]", None, synth.EPOCH),
        ("c0", 1, "user", "also [[utterly unknown surface]]", None, synth.EPOCH),
    ]
    triples = extract_triples(synth.corpus_df(spark, synth.Corpus(rows=rows)))
    catalog = build_catalog(spark)
    static = link_mentions(triples, catalog)
    static_surfaces = {r.subj for r in static.collect()}
    assert "external entity one" not in static_surfaces  # needs the KB

    out = link_with_external_fallback(
        triples, catalog, _kb_resolver, str(tmp_path / "cache")
    )
    by_subj = {r.subj: (r.pred, r.obj, r.conf) for r in out.collect()}
    assert by_subj["spark"] == (rules.PRED_SAME_AS, "Q_spark", 1.0)
    assert by_subj["external entity one"] == (rules.PRED_SAME_AS, "Q_ext1", 0.9)
    assert "utterly unknown surface" not in by_subj
    # schema matches the static linker's triple schema exactly
    assert out.columns == static.columns
    # only the unresolved tail ever reaches the resolver: re-linking
    # with a raising resolver works entirely from cache
    again = link_with_external_fallback(
        triples, catalog, _raising_resolver, str(tmp_path / "cache")
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}