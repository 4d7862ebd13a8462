"""Benchmark decontamination: flag training documents that collide
with an evaluation/benchmark set on word n-grams.

The standard published recipe (GPT-3 appendix C / the C4 analysis in
Dodge et al. 2021 — public knowledge): a training document is
contaminated if it shares at least one length-``n`` word n-gram with
any benchmark example (n chosen long enough, typically 8–13, that a
collision is evidence of copying rather than chance).  This module
reports, per document, the collision count, the contaminated fraction
of the doc's n-grams, and the keep/drop verdict — the gate a training
pipeline runs right before packing.

Scale shape (the whole point at 100 TB): the benchmark side is an
eval set — 10³–10⁶ examples, 10⁵–10⁷ distinct n-grams — so its
distinct n-gram set is explicitly ``broadcast()``; the corpus side is
one projection (tokenize → sliding n-grams → explode distinct) that
never shuffles, and the only shuffled rows are the *hits* of the
broadcast inner join (bounded by actual contamination, not corpus
size) aggregated per doc_id with map-side combine.  No corpus-vs-
corpus join exists anywhere — corpus rows meet only the broadcast
set.  Tokenization matches ``dedup.TOKEN_SPLIT`` (lowercase,
whitespace split) so decontamination and near-dup dedup agree on what
a token is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexicator_spark.operators.dedup import TOKEN_SPLIT


def _ordered_tokens(col: Column) -> Column:
    """Lowercased whitespace tokens in document order (NOT the
    set-semantics ``dedup._tokens`` — n-grams need sequence)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != F.lit(""))


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct space-joined word n-grams of ``col``; empty array when
    the text has fewer than ``n`` tokens.  The ``when`` guard matters:
    Spark's ``sequence(1, size-n+1)`` auto-steps *downward* when the
    stop is below the start, so an unguarded short doc would emit
    bogus negative-index slices instead of nothing."""
    toks = _ordered_tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct n-gram set — one column ``gram``.
    Distinct BEFORE broadcast so the shipped table is minimal."""
    return (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    bench_text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns one row per input doc:
      (id_col, n_doc_ngrams, n_hits, contam_frac, is_contaminated)
    where ``n_hits`` counts the doc's DISTINCT n-grams found anywhere
    in the benchmark, ``contam_frac = n_hits / n_doc_ngrams`` (0.0 for
    docs shorter than ``n`` tokens — they cannot collide), and
    ``is_contaminated = n_hits >= min_hits`` (default: any collision
    flags the doc, the published-recipe default).

    Plan: corpus-side single projection + explode; broadcast inner
    join against the benchmark n-gram set; hit counts aggregate on
    ``id_col`` (only colliding rows shuffle); one left join puts the
    counts back on the per-doc base.  Docs with zero hits never leave
    their scan partition until the final join.
    """
    base = docs.select(
        F.col(id_col),
        F.size(word_ngrams(F.col(text_col), n)).alias("n_doc_ngrams"),
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    bench = F.broadcast(benchmark_ngrams(benchmark, n=n, text_col=bench_text_col))
    hits = (
        doc_grams.join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_doc_ngrams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.when(
                F.col("n_doc_ngrams") > 0,
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.col("n_doc_ngrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "is_contaminated"
            ),
        )
    )
