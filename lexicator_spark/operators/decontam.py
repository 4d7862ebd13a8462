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
ONE pass (tokenize → n-grams → explode_outer → broadcast left join →
per-doc count aggregate) that computes each doc's grams exactly once
and, thanks to map-side partial aggregation on ``id_col`` (a doc's
exploded grams never leave their scan partition before the partial
agg), shuffles ~one row per document — not per gram.  No corpus-vs-
corpus join exists anywhere — corpus rows meet only the broadcast
set.  Tokenization matches ``dedup.TOKEN_SPLIT`` (lowercase,
whitespace split) so decontamination and near-dup dedup agree on what
a token is.

Expression-shape note: the token array MUST be materialized as its
own projected column before the n-gram ``transform`` consumes it.
An inline ``filter(split(...))`` subtree referenced from inside the
``transform`` lambda is re-evaluated per sequence element — O(tokens²)
string splitting per row, measured 6× slower at sf0.1.  The projected
alias is referenced ≥3 times downstream, which keeps Catalyst's
CollapseProject from inlining it back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE shared ordered tokenizer (textstats._toks, split on
# dedup.TOKEN_SPLIT) — one implementation repo-wide so dedup,
# text-stats, and decontamination agree on what a token is.  (NOT the
# set-semantics ``dedup._tokens`` — n-grams need sequence.)
from lexicator_spark.operators.textstats import _toks as _ordered_tokens


def gram_array(toks: Column, n: int, distinct: bool = True) -> Column:
    """Space-joined word n-grams of an ALREADY-MATERIALIZED
    token-array column (pass ``F.col(...)``, not an expression tree —
    see the module docstring); empty array when fewer than ``n``
    tokens.  ``distinct=False`` keeps every positional gram
    (multiplicity matters for intra-doc repetition scoring).  The
    ``when`` guard matters: Spark's ``sequence(1, size-n+1)``
    auto-steps *downward* when the stop is below the start, so an
    unguarded short doc would emit bogus negative-index slices
    instead of nothing."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct n-gram set — one column ``gram``.
    Distinct BEFORE broadcast so the shipped table is minimal."""
    toked = benchmark.select(_ordered_tokens(F.col(text_col)).alias("_toks"))
    return (
        toked.select(F.explode(gram_array(F.col("_toks"), n)).alias("gram"))
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

    Plan: one corpus-side projection (tokens materialized once,
    grams exploded with ``explode_outer`` so gram-less docs keep a
    row) → broadcast LEFT join against the benchmark n-gram set →
    ONE ``groupBy(id_col)`` counting total grams and bench matches
    together.  Map-side combine collapses each doc to a single
    partial row before the only shuffle.
    """
    toked = docs.select(
        F.col(id_col), _ordered_tokens(F.col(text_col)).alias("_toks")
    )
    doc_grams = toked.select(
        F.col(id_col),
        F.explode_outer(gram_array(F.col("_toks"), n)).alias("gram"),
    )
    bench = F.broadcast(
        benchmark_ngrams(benchmark, n=n, text_col=bench_text_col).select(
            F.col("gram").alias("_bench_gram")
        )
    )
    return (
        doc_grams.join(bench, doc_grams["gram"] == bench["_bench_gram"], "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_doc_ngrams"),
            F.count("_bench_gram").alias("n_hits"),
        )
        .select(
            id_col,
            "n_doc_ngrams",
            "n_hits",
            F.when(
                F.col("n_doc_ngrams") > 0,
                F.col("n_hits") / F.col("n_doc_ngrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
            (F.col("n_hits") >= min_hits).alias("is_contaminated"),
        )
    )
