"""Stage A — vectorized triple extraction over transcript turns.

The analog of lexicator's page→template parse stage
(``lexicator/TemplateParser.py :: TemplateParser.parse_page`` [H name]
plus the dispatch table in ``lexicator/TemplateProcessor.py`` [M];
SURVEY.md §2 ops #3/#4/#5/#11/#12).  Where lexicator walked wikitext
one page at a time in a Python loop, this stage is a single Spark plan:

- stable turn ordering via a window over ``(conv_id, turn_idx)`` —
  the north_rule's per-turn text-equality invariant: no rule ever
  depends on shuffle / insertion order;
- text rules run inside ONE Arrow-batched pandas UDF (Series →
  Series of array<struct>) — no per-row Python UDFs; an alternative
  pure-Catalyst implementation (JVM ``regexp_extract_all``) is kept
  for benchmarking and cross-checked for equality in tests;
- per-row error channel: rule failures become ``_error`` rows, never
  exceptions (SURVEY.md §2 #12).

Scale notes: the only shuffle in this stage is the window partition
on ``conv_id`` (needed for ``replies_to`` ordering); everything else
is a narrow map over the scan, so the stage parallelizes linearly in
input partitions.  Mention/relation regexes are compiled once per
executor (module import), not per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lexicator_spark import rules

# array<struct<pred,obj,conf>> emitted per turn by the text-rule UDF
_RULE_HIT = T.ArrayType(
    T.StructType(
        [
            T.StructField("pred", T.StringType(), False),
            T.StructField("obj", T.StringType(), False),
            T.StructField("conf", T.DoubleType(), False),
        ]
    )
)

TRIPLE_COLUMNS = ["subj", "pred", "obj", "conf", "conv_id", "turn_idx", "extracted_at"]


def _text_rule_hits(texts: pd.Series) -> pd.Series:
    """Batched application of every text rule.  Pure function of the
    text column; shared rule content comes from lexicator_spark.rules
    so the pytest oracle can never drift."""
    out = []
    for text in texts:
        hits: list[tuple[str, str, float]] = []
        try:
            if text:
                for m in rules.MENTION_RE.findall(text):
                    hits.append(
                        (rules.PRED_MENTIONS, rules.normalize_surface(m), 1.0)
                    )
                for m in rules.WIKILINK_RE.findall(text):
                    hits.append(
                        (rules.PRED_MENTIONS, rules.normalize_surface(m), 0.8)
                    )
                for m in rules.DEPENDS_RE.findall(text):
                    a, b = rules.DEPENDS_SPLIT.split(m, 1)
                    hits.append(
                        (rules.PRED_DEPENDS_ON + "\x00" + rules.normalize_surface(a),
                         rules.normalize_surface(b), 1.0)
                    )
                for name, _params in rules.TEMPLATE_RE.findall(text):
                    hits.append((rules.PRED_INVOKES, name, 1.0))
        except Exception as exc:  # error channel, never throw in a UDF
            hits.append(("_error", f"{type(exc).__name__}: {exc}", 0.0))
        out.append(hits)
    return pd.Series(out)


_text_rule_udf = F.pandas_udf(_text_rule_hits, _RULE_HIT)


def extract_triples(turns: DataFrame, impl: str = "pandas") -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) → triples
    (subj, pred, obj, conf, conv_id, turn_idx, extracted_at).

    ``impl='pandas'`` (default, Arrow-batched UDF) or ``'native'``
    (pure Catalyst regexp functions, JVM-side) — equal output, the
    native path exists so the 100 TB deployment can stay entirely in
    whole-stage codegen if profiling favors it.
    """
    turns = turns.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    uri = F.concat_ws("#", F.col("conv_id"), F.col("turn_idx").cast("string"))

    # --- structural rules (pure Catalyst, no text parsing) ------------
    uses_tool = (
        turns.filter(F.col("tool").isNotNull())
        .select(
            uri.alias("subj"),
            F.lit(rules.PRED_USES_TOOL).alias("pred"),
            F.col("tool").alias("obj"),
            F.lit(1.0).alias("conf"),
            "conv_id",
            "turn_idx",
            F.col("ts").alias("extracted_at"),
        )
    )

    # replies_to via lag over the stable (conv_id, turn_idx) window —
    # enforces the ordering invariant instead of trusting arithmetic
    # on possibly-non-contiguous turn indexes.
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    replies = (
        turns.withColumn("prev_idx", F.lag("turn_idx").over(w))
        .filter(F.col("prev_idx").isNotNull())
        .select(
            uri.alias("subj"),
            F.lit(rules.PRED_REPLIES_TO).alias("pred"),
            F.concat_ws(
                "#", F.col("conv_id"), F.col("prev_idx").cast("string")
            ).alias("obj"),
            F.lit(1.0).alias("conf"),
            "conv_id",
            "turn_idx",
            F.col("ts").alias("extracted_at"),
        )
    )

    # --- text rules ----------------------------------------------------
    if impl == "pandas":
        hits = turns.withColumn("hits", _text_rule_udf(F.col("text")))
    elif impl == "native":
        hits = _native_text_hits(turns)
    else:
        raise ValueError(f"unknown impl {impl!r}")

    text_triples = (
        hits.select(
            "conv_id",
            "turn_idx",
            F.col("ts").alias("extracted_at"),
            uri.alias("turn_uri"),
            F.explode("hits").alias("h"),
        )
        .select(
            # depends_on packs its subject into pred after \x00 (the
            # relation's subject is an entity, not the turn)
            F.when(
                F.col("h.pred").startswith(rules.PRED_DEPENDS_ON + "\x00"),
                F.substring_index(F.col("h.pred"), "\x00", -1),
            )
            .otherwise(F.col("turn_uri"))
            .alias("subj"),
            F.substring_index(F.col("h.pred"), "\x00", 1).alias("pred"),
            F.col("h.obj").alias("obj"),
            F.col("h.conf").alias("conf"),
            "conv_id",
            "turn_idx",
            "extracted_at",
        )
    )

    out = uses_tool.unionByName(replies).unionByName(text_triples)
    # idempotency / dedup (SURVEY.md §2 #10) — a payload planted twice
    # in one turn is one fact
    return out.dropDuplicates(["subj", "pred", "obj", "conv_id", "turn_idx"])


def _native_text_hits(turns: DataFrame) -> DataFrame:
    """Pure-Catalyst text rules: JVM regexp_extract_all inside
    whole-stage codegen.  Produces the same ``hits`` array column as
    the pandas UDF (verified equal in tests/test_extract.py)."""
    norm = lambda c: F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))

    mention = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(rules.MENTION_PATTERN), F.lit(0)),
        lambda m: F.struct(
            F.lit(rules.PRED_MENTIONS).alias("pred"),
            norm(m).alias("obj"),
            F.lit(1.0).alias("conf"),
        ),
    )
    wikilink = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(rules.WIKILINK_PATTERN), F.lit(1)),
        lambda m: F.struct(
            F.lit(rules.PRED_MENTIONS).alias("pred"),
            norm(m).alias("obj"),
            F.lit(0.8).alias("conf"),
        ),
    )
    depends = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(rules.DEPENDS_PATTERN), F.lit(0)),
        lambda m: F.struct(
            F.concat(
                F.lit(rules.PRED_DEPENDS_ON + "\x00"),
                norm(F.regexp_extract(m, "(?i)^(.*?) depends on ", 1)),
            ).alias("pred"),
            norm(F.regexp_extract(m, "(?i) depends on (.*)$", 1)).alias("obj"),
            F.lit(1.0).alias("conf"),
        ),
    )
    invokes = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(rules.TEMPLATE_PATTERN), F.lit(1)),
        lambda m: F.struct(
            F.lit(rules.PRED_INVOKES).alias("pred"),
            m.alias("obj"),
            F.lit(1.0).alias("conf"),
        ),
    )
    return turns.withColumn(
        "hits", F.concat(mention, wikilink, depends, invokes)
    )


def split_rejects(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the error channel off the good triples (SURVEY.md §2 #12)."""
    good = triples.filter(F.col("pred") != "_error")
    rejects = triples.filter(F.col("pred") == "_error")
    return good, rejects
