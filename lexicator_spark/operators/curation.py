"""Corpus curation: the end-to-end keep/drop + split decision a
training-data pipeline exports.

Composes the per-document operators this engine already provides —
token counts + quality score + language id (``textstats``, all
integer-basis-point exact), near-dup cluster keep decisions
(``dedup.near_dup_clusters``) — into ONE narrow pass producing, for
every input document: the measured features, a ``keep`` verdict, the
first failing ``drop_reason``, and a deterministic train/val ``split``.

Everything stays a single projection over the scan plus one left join
against the (linear-size) cluster table; at 100 TB this is the same
shape as the quality pass alone.  The split hashes CONTENT (md5 of
text), not ids: re-assigning doc ids never moves a document across
splits, and exact duplicates land in the same split by construction —
no train/val leakage through copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexicator_spark.operators import textstats as TS


def with_split(
    docs: DataFrame, val_pct: int = 10, text_col: str = "text"
) -> DataFrame:
    """Deterministic content-hash split: bucket = first 8 hex chars of
    ``md5(text)`` as an int mod 100; bucket < ``val_pct`` → 'val'.
    md5 is engine-portable (identical in DuckDB), so the assignment is
    an exact SQL twin, and content-hashing keeps duplicate texts in
    one split."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    return docs.withColumn("split_bucket", bucket).withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
    )


def curate_corpus(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    min_tokens: int = 5,
    min_quality_bp: int = 4000,
    allowed_langs: tuple[str, ...] = ("en",),
    val_pct: int = 10,
) -> DataFrame:
    """One row per input document:
    (doc_id, n_tokens, quality_bp, lang_pred, split, keep, drop_reason).

    ``clusters`` is a ``near_dup_clusters`` output — pass the
    ``minhash_lsh_star_edges``-backed variant at scale (linear) or the
    exact-Jaccard one where an oracle is needed; omitted → no dedup
    gate.  ``drop_reason`` is the FIRST failing check in the fixed
    order duplicate → lang → too_short → low_quality (the order real
    pipelines report: cheapest-to-explain first), null iff kept."""
    feats = with_split(
        TS.with_langid(TS.with_quality(docs)), val_pct=val_pct
    )
    if clusters is not None:
        keep_dup = clusters.select("doc_id", F.col("keep").alias("dup_keep"))
        feats = feats.join(keep_dup, "doc_id", "left").withColumn(
            "dup_keep", F.coalesce(F.col("dup_keep"), F.lit(True))
        )
    else:
        feats = feats.withColumn("dup_keep", F.lit(True))
    lang_ok = F.col("lang_pred").isin(list(allowed_langs))
    long_enough = F.col("n_tokens") >= min_tokens
    good_enough = F.col("quality_bp") >= min_quality_bp
    keep = F.col("dup_keep") & lang_ok & long_enough & good_enough
    drop_reason = (
        F.when(~F.col("dup_keep"), F.lit("duplicate"))
        .when(~lang_ok, F.lit("lang"))
        .when(~long_enough, F.lit("too_short"))
        .when(~good_enough, F.lit("low_quality"))
    )
    return feats.select(
        "doc_id",
        "n_tokens",
        "quality_bp",
        "lang_pred",
        "split",
        keep.alias("keep"),
        drop_reason.alias("drop_reason"),
    )
