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