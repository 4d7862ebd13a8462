"""External-resolver seam for Stage B (SURVEY.md §2 #6 fallback shape).

The default reconciliation path is the deterministic broadcast rule
table in ``operators.link`` — at 10^12-turn scale an external lookup
per surface is not viable as the primary path.  But a user with a real
external KB (Wikidata's wbsearchentities, an internal entity service)
needs a seam to plug into.  This module is that seam:

- ``resolve_surfaces``: DISTINCT surfaces → (surface, canonical_id,
  resolve_conf) via an Arrow-batched ``mapInPandas`` operator.  The
  resolver callable receives a LIST of surfaces per micro-batch (so a
  real client can issue one bulk request per batch instead of one per
  row) and returns one (canonical_id | None, confidence) per surface.
- results are cached in a persistent parquet table: surfaces already
  resolved are served from the cache with a join and NEVER hit the
  resolver again — re-runs of the pipeline are free, and the cache
  table is shared across jobs the way lexicator's sqlite page cache
  was (``ContentStore`` [M]).
- unresolved surfaces (resolver returned None) are cached too, as
  tombstones, so known-misses are not retried every run.

Scale shape: the only rows that ever reach Python are NEW distinct
surfaces (cache anti-join first); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and the optional
``chunk_size`` micro-batching inside the operator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lexicator_spark.sources import fsutil
from lexicator_spark.sources import io as sio

# resolver contract: surfaces -> [(canonical_id | None, confidence)]
ResolverFn = Callable[[list[str]], list[tuple[str | None, float]]]

_RESOLVED_SCHEMA = "surface string, canonical_id string, resolve_conf double"


def _resolve_new(
    surfaces: DataFrame, resolver_fn: ResolverFn, chunk_size: int
) -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf["surface"].tolist()
            for lo in range(0, len(vals), chunk_size):
                chunk = vals[lo : lo + chunk_size]
                results = resolver_fn(chunk)
                if len(results) != len(chunk):
                    raise ValueError(
                        f"resolver returned {len(results)} results for "
                        f"{len(chunk)} surfaces"
                    )
                yield pd.DataFrame(
                    {
                        "surface": chunk,
                        "canonical_id": [r[0] for r in results],
                        "resolve_conf": [float(r[1]) for r in results],
                    }
                )

    return surfaces.mapInPandas(op, schema=_RESOLVED_SCHEMA)


def resolve_surfaces(
    spark: SparkSession,
    surfaces: DataFrame,
    resolver_fn: ResolverFn,
    cache_location: str | None = None,
    chunk_size: int = 200,
) -> DataFrame:
    """surfaces(surface string) → (surface, canonical_id, resolve_conf).

    ``canonical_id`` is null for surfaces the resolver could not map
    (kept in the output AND in the cache as tombstones).  With a
    ``cache_location``, only surfaces absent from the cache invoke
    ``resolver_fn``; fresh results are appended to the cache."""
    distinct = surfaces.select("surface").distinct()
    if cache_location is None:
        # materialized: the resolver is side-effectful (rate-limited
        # external calls) — it must run once, not once per downstream
        # action / task retry
        return _resolve_new(distinct, resolver_fn, chunk_size).localCheckpoint(
            eager=True
        )

    if fsutil.exists(spark, cache_location):
        cache = sio.read_table(spark, cache_location)
    else:
        cache = spark.createDataFrame([], _RESOLVED_SCHEMA)

    hits = distinct.join(cache, "surface", "inner").select(
        "surface", "canonical_id", "resolve_conf"
    )
    misses = distinct.join(cache, "surface", "left_anti")
    fresh = _resolve_new(misses, resolver_fn, chunk_size)
    # materialize before appending so the resolver runs exactly once
    # even though `fresh` feeds both the cache write and the result
    fresh = fresh.localCheckpoint(eager=True)
    sio.write_table(fresh, cache_location, mode="append", partition_key=None)
    return hits.unionByName(fresh)


def link_with_external_fallback(
    triples: DataFrame,
    catalog: DataFrame,
    resolver_fn: ResolverFn,
    cache_location: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Stage-B composition: the broadcast rule-table linker first,
    then the external resolver ONLY for mention surfaces the static
    catalog could not link — the resolver sees the (small) unresolved
    tail, never the corpus."""
    from lexicator_spark import rules
    from lexicator_spark.operators.extract import null_span
    from lexicator_spark.operators.link import link_mentions, mention_surfaces

    spark = triples.sparkSession
    # materialized once: `static` feeds both the unresolved-tail
    # anti-join (evaluated eagerly inside resolve_surfaces) and the
    # returned union — without this, Stage-B linking runs twice
    static = link_mentions(triples, catalog).localCheckpoint(eager=True)
    unresolved = mention_surfaces(triples).join(
        static.select(F.col("subj").alias("surface")), "surface", "left_anti"
    )
    external = resolve_surfaces(
        spark, unresolved, resolver_fn, cache_location
    ).filter(
        F.col("canonical_id").isNotNull() & (F.col("resolve_conf") >= threshold)
    )
    external_triples = external.select(
        F.col("surface").alias("subj"),
        F.lit(rules.PRED_SAME_AS).alias("pred"),
        F.col("canonical_id").alias("obj"),
        F.col("resolve_conf").alias("conf"),
        null_span(),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(None).cast("timestamp").alias("extracted_at"),
    )
    return static.unionByName(external_triples)
