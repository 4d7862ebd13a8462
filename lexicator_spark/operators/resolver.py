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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lexicator_spark.sources import fsutil
from lexicator_spark.sources import io as sio

# resolver contract: surfaces -> [(canonical_id | None, confidence)].
# Return (None, 0.0) ONLY for a definitive "this surface has no
# entity" — it is cached as a tombstone.  On transient failures
# (timeouts, rate limits, outages) the resolver MUST raise: a raised
# batch is retried by Spark and never cached, while a None would
# tombstone the surface and suppress its links on every future run
# until the tombstone TTL (if any) expires.
ResolverFn = Callable[[list[str]], list[tuple[str | None, float]]]

_RESOLVED_SCHEMA = "surface string, canonical_id string, resolve_conf double"
_CACHE_SCHEMA = _RESOLVED_SCHEMA + ", resolved_at timestamp"


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
    tombstone_ttl_minutes: int | None = None,
) -> DataFrame:
    """surfaces(surface string) → (surface, canonical_id, resolve_conf).

    ``canonical_id`` is null for surfaces the resolver could not map
    (kept in the output AND in the cache as tombstones).  With a
    ``cache_location``, only surfaces absent from the cache invoke
    ``resolver_fn``; fresh results are appended to the cache with a
    ``resolved_at`` timestamp.

    Cache hygiene:
    - the cache may hold duplicate surface rows (append-mode retries,
      concurrent pipelines sharing the location) — only the NEWEST row
      per surface is used, so the hits join never fans out;
    - with ``tombstone_ttl_minutes``, tombstones older than the TTL
      (or with unknown age, from pre-``resolved_at`` caches) are
      treated as misses and re-resolved — an external KB that has
      since learned the surface gets a second chance; positive entries
      never expire (re-resolution belongs to a cache rebuild, not the
      hot path);
    - nothing is appended (and no sidecar rewritten) when there are no
      misses — re-runs leave the cache byte-identical."""
    distinct = surfaces.select("surface").distinct()
    stamp = lambda df: df.withColumn("resolved_at", F.current_timestamp())
    if cache_location is None:
        # materialized: the resolver is side-effectful (rate-limited
        # external calls) — it must run once, not once per downstream
        # action / task retry
        return _resolve_new(distinct, resolver_fn, chunk_size).localCheckpoint(
            eager=True
        )

    if fsutil.exists(spark, cache_location):
        cache = sio.read_table(spark, cache_location)
        if "resolved_at" not in cache.columns:
            cache = cache.withColumn(
                "resolved_at", F.lit(None).cast("timestamp")
            )
    else:
        cache = spark.createDataFrame([], _CACHE_SCHEMA)

    newest = Window.partitionBy("surface").orderBy(
        F.col("resolved_at").desc_nulls_last(), F.col("canonical_id").asc_nulls_last()
    )
    cache = (
        cache.withColumn("rn", F.row_number().over(newest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    usable = cache
    if tombstone_ttl_minutes is not None:
        fresh_enough = F.col("resolved_at") >= F.current_timestamp() - F.expr(
            f"INTERVAL {int(tombstone_ttl_minutes)} MINUTES"
        )
        usable = cache.filter(
            F.col("canonical_id").isNotNull()
            | (F.col("resolved_at").isNotNull() & fresh_enough)
        )

    hits = distinct.join(usable, "surface", "inner").select(
        "surface", "canonical_id", "resolve_conf"
    )
    misses = distinct.join(usable, "surface", "left_anti")
    if misses.limit(1).count() == 0:
        # no resolver call, no cache append, no sidecar rewrite
        return hits
    fresh = _resolve_new(misses, resolver_fn, chunk_size)
    # materialize before appending so the resolver runs exactly once
    # even though `fresh` feeds both the cache write and the result
    fresh = fresh.localCheckpoint(eager=True)
    sio.write_table(
        stamp(fresh), cache_location, mode="append", partition_key=None
    )
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
