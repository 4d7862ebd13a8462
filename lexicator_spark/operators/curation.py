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
    bucket = TS.md5_bucket(F.col(text_col), 100)
    return docs.withColumn("split_bucket", bucket).withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    partition_cols: tuple[str, ...] = ("split",),
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous token-budget packing: within each partition group,
    documents (in ``order_col`` order) are assigned to consecutive
    bins of ``budget`` tokens — ``bin = floor(tokens_before / budget)``
    where ``tokens_before`` is the running token count of all earlier
    docs in the group.  This is the streaming-writer semantics (fill
    the current context window, start the next when it would
    overflow¹), deterministic and exactly SQL-expressible as a window
    cumulative sum.

    ¹ A doc whose tokens straddle a boundary belongs to the bin its
    FIRST token falls in — bins can therefore exceed ``budget`` by at
    most one document's tail, exactly like a greedy packer that
    truncates/continues across windows.

    Scale note: the window orders WITHIN partition groups, so
    parallelism = number of groups.  ``("split",)`` is fine for
    test-scale corpora; at 100 TB pass ``("split", "p_hash")`` (or any
    bucketing column) so each group is a bounded bucket — packing is a
    per-bucket decision in real pipelines anyway (readers consume
    buckets independently).

    Determinism precondition: the order keys must be unique within
    each partition group, or the running sum breaks ties in arbitrary
    task order and re-runs can move tied docs across a bin boundary.
    ``mixture_sample`` output intentionally repeats ``doc_id`` across
    copies — its ``copy_idx`` is appended to the order automatically."""
    from pyspark.sql import Window

    if budget < 1:
        # fail loudly: budget 0 would divide by zero, which non-ANSI
        # Spark folds to a NULL bin for every row instead of an error
        raise ValueError(f"pack_sequences budget must be >= 1, got {budget}")
    order_cols = [order_col]
    if "copy_idx" in docs.columns and order_col != "copy_idx":
        order_cols.append("copy_idx")
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(TS._toks(F.col(text_col)))
    with_n = docs.withColumn("n_tokens", n_tok)
    cum = F.sum("n_tokens").over(w)
    return with_n.select(
        *partition_cols,
        *order_cols,
        "n_tokens",
        # floor, not cast: double→bigint CAST rounds in some engines
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("bin"),
        (cum - F.col("n_tokens")).alias("tokens_before"),
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted data mixing — the source-mixture step a
    training pipeline runs after curation (the published recipe:
    per-source sampling weights, with upsampling weights > 1 repeating
    a source multiple times per epoch).  Source ``s`` with weight
    ``w`` contributes ``floor(w)`` full copies of each doc plus one
    fractional copy sampled with probability ``w − floor(w)``, so the
    expected row count per doc is exactly ``w``.  Sources absent from
    ``weights`` (or with weight 0) are dropped.

    Sampling is a pure md5 hash of (key, copy index, seed) — no RNG,
    retry-stable, partitioning-independent, engine-portable (the same
    md5-bucket idiom as ``with_split``).  Output = input columns +
    ``copy_idx`` (0-based, distinct per repeated copy so downstream
    packing treats copies as separate rows).

    Plan shape: a literal when-chain over the (small, driver-known)
    source list, one ``explode`` of a per-row index sequence sized
    ``ceil(w)``, and a filter in the same projection — output-
    proportional work, zero shuffles, scales to any corpus size.
    """
    full = {s: int(w) for s, w in weights.items()}
    frac_ppm = {s: round((w - int(w)) * 1_000_000) for s, w in weights.items()}
    n_cand = {
        s: full[s] + (1 if frac_ppm[s] > 0 else 0) for s in weights
    }
    live = [s for s in weights if n_cand[s] > 0]
    if not live:
        return docs.withColumn("copy_idx", F.lit(0)).limit(0)

    def chain(mapping: dict[str, int]) -> F.Column:
        col = F.lit(None).cast("int")
        for s in live:
            col = F.when(F.col(source_col) == s, F.lit(mapping[s])).otherwise(col)
        return col

    hash_ppm = TS.md5_bucket(
        F.concat_ws(
            "\x1f",
            F.col(key_col).cast("string"),
            F.col("copy_idx").cast("string"),
            F.lit(str(seed)),
        ),
        1_000_000,
    )
    return (
        docs.filter(F.col(source_col).isin(live))
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), chain(n_cand) - F.lit(1))),
        )
        .filter(
            (F.col("copy_idx") < chain(full)) | (hash_ppm < chain(frac_ppm))
        )
    )


def curate_corpus(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    min_tokens: int = 5,
    min_quality_bp: int = 4000,
    allowed_langs: tuple[str, ...] = ("en",),
    val_pct: int = 10,
    contamination: DataFrame | None = None,
    max_dup_ngram_bp: int | None = None,
) -> DataFrame:
    """One row per input document:
    (doc_id, n_tokens, quality_bp, lang_pred, split, keep, drop_reason).

    ``clusters`` is a ``near_dup_clusters`` output — pass the
    ``minhash_lsh_star_edges``-backed variant at scale (linear) or the
    exact-Jaccard one where an oracle is needed; omitted → no dedup
    gate.  ``contamination`` is a ``decontam.decontaminate`` report —
    docs flagged ``is_contaminated`` are dropped (eval-set collision);
    docs absent from the report pass the gate.  ``max_dup_ngram_bp``
    enables the Gopher-style intra-document repetition gate
    (``textstats.with_repetition``): docs whose duplicate-3-gram
    fraction exceeds the cap (basis points) drop as 'repetitive'.
    ``drop_reason`` is the FIRST failing check in the fixed order
    duplicate → contaminated → lang → too_short → low_quality →
    repetitive (the order real pipelines report: cheapest-to-explain
    first), null iff kept."""
    # one shared token array for every text feature in the chain
    toked = TS.with_tokens(docs)
    feats = with_split(
        TS.with_langid(
            TS.with_quality(toked, toks_col="__toks"), toks_col="__toks"
        ),
        val_pct=val_pct,
    )
    if max_dup_ngram_bp is not None:
        feats = TS.with_repetition(feats, toks_col="__toks")
        not_repetitive = F.col("dup_ngram_frac_bp") <= max_dup_ngram_bp
    else:
        not_repetitive = F.lit(True)
    feats = feats.drop("__toks")
    if clusters is not None:
        keep_dup = clusters.select("doc_id", F.col("keep").alias("dup_keep"))
        feats = feats.join(keep_dup, "doc_id", "left").withColumn(
            "dup_keep", F.coalesce(F.col("dup_keep"), F.lit(True))
        )
    else:
        feats = feats.withColumn("dup_keep", F.lit(True))
    if contamination is not None:
        contam = contamination.select("doc_id", "is_contaminated")
        feats = feats.join(contam, "doc_id", "left").withColumn(
            "is_contaminated",
            F.coalesce(F.col("is_contaminated"), F.lit(False)),
        )
    else:
        feats = feats.withColumn("is_contaminated", F.lit(False))
    lang_ok = F.col("lang_pred").isin(list(allowed_langs))
    long_enough = F.col("n_tokens") >= min_tokens
    good_enough = F.col("quality_bp") >= min_quality_bp
    clean = ~F.col("is_contaminated")
    keep = (
        F.col("dup_keep") & clean & lang_ok & long_enough & good_enough
        & not_repetitive
    )
    drop_reason = (
        F.when(~F.col("dup_keep"), F.lit("duplicate"))
        .when(~clean, F.lit("contaminated"))
        .when(~lang_ok, F.lit("lang"))
        .when(~long_enough, F.lit("too_short"))
        .when(~good_enough, F.lit("low_quality"))
        .when(~not_repetitive, F.lit("repetitive"))
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
