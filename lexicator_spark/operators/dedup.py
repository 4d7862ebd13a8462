"""Document deduplication operators for large-scale training-data
pipelines: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the point of each design):
- exact: one hash-groupBy shuffle on a 16-byte digest — the cheapest
  possible dedup at any scale; never groups on raw text.
- ngram-Jaccard: candidate pairs come from an inverted-index
  self-join restricted to LOW-FREQUENCY tokens (df ≤ max_token_df),
  so common tokens never explode the join; exact Jaccard verifies.
- MinHash+LSH: fixed-size signature per doc (pandas UDF, Arrow
  batched), banded into LSH buckets; the only shuffle is the bucket
  groupBy — all-pairs never materializes. Deterministic hash family
  (zlib.crc32 with fixed seeds), no Python ``hash()``.
- SimHash: 64-bit fingerprint; near-dup candidates share at least one
  of four 16-bit chunks (Hamming ≤ 3 guaranteed found by pigeonhole),
  verified by exact Hamming distance.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT = "\\s+"


def _tokens(col):
    return F.array_distinct(
        F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != F.lit(""))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): (keep_id, n_copies).
    Only groups with more than one copy are returned."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keep_id", "n_copies")
    )


def tokenset_dedup(docs: DataFrame) -> DataFrame:
    """Near-dup clusters: identical distinct-token SET (order/multiplicity
    insensitive).  Signature = md5 of the sorted distinct tokens."""
    sig = F.md5(F.concat_ws(" ", F.array_sort(_tokens(F.col("text")))))
    return (
        docs.select("doc_id", sig.alias("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .select("keep_id", "n_members")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, max_token_df: int = 50
) -> DataFrame:
    """Near-duplicate pairs (a < b) with token-Jaccard ≥ threshold.

    Inverted-index blocking: docs become candidates only if they share
    a token whose document frequency ≤ max_token_df — common tokens
    are dropped from the index (they cannot be the only evidence for
    a high-Jaccard pair when rare tokens exist, and they are what
    makes naive token self-joins quadratic)."""
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))

    rare = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_token_df)
        .select("tok")
    )
    idx = toks.join(rare, "tok")

    a = idx.select(F.col("tok"), F.col("doc_id").alias("a"))
    b = idx.select(F.col("tok"), F.col("doc_id").alias("b"))
    common = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_tok").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
_N_HASHES = 32
_N_BANDS = 8  # 4 rows per band

_MINHASH_SCHEMA = T.ArrayType(T.LongType())


def _crc(s: str, seed: int) -> int:
    return zlib.crc32(f"{seed}:{s}".encode()) & 0xFFFFFFFF


@F.pandas_udf(_MINHASH_SCHEMA)
def _minhash_sig(texts: pd.Series) -> pd.Series:
    out = []
    for text in texts:
        toks = sorted({t for t in (text or "").lower().split() if t})
        if not toks:
            out.append([0] * _N_HASHES)
            continue
        sig = []
        for h in range(_N_HASHES):
            sig.append(min(_crc(t, h) for t in toks))
        out.append(sig)
    return pd.Series(out)


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Candidate pairs via banded MinHash-LSH, verified by exact token
    Jaccard.  Signature: 32 hashes, 8 bands × 4 rows."""
    sigs = docs.select(
        "doc_id", _tokens(F.col("text")).alias("toks"), _minhash_sig("text").alias("sig")
    )
    rows_per_band = _N_HASHES // _N_BANDS
    bands = sigs.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_BANDS - 1)),
                lambda b: F.slice(
                    F.col("sig"), b * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band", "band_sig"),
    ).withColumn("bucket", F.xxhash64(F.col("band"), F.concat_ws(",", F.transform("band_sig", lambda x: x.cast("string")))))

    l = bands.select(F.col("bucket"), F.col("doc_id").alias("a"), F.col("toks").alias("ta"))
    r = bands.select(F.col("bucket"), F.col("doc_id").alias("b"), F.col("toks").alias("tb"))
    cand = (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ta", "tb")
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("ta", "tb")).cast("double")
            / F.size(F.array_union("ta", "tb")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = {t for t in (text or "").lower().split() if t}
        if not toks:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = (_crc(t, 0) << 32) | _crc(t, 1)  # python int, 64 bits
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        # wrap to signed 64-bit for LongType
        if v >= 1 << 63:
            v -= 1 << 64
        out[i] = v
    return pd.Series(out)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance ≤ max_hamming.
    Pigeonhole blocking on four 16-bit chunks (any pair within
    Hamming ≤ 3 shares at least one chunk exactly)."""
    sh = docs.select("doc_id", _simhash64("text").alias("sh"))
    chunks = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), k * 16).bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    l = chunks.select("chunk_idx", "chunk", F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    r = chunks.select("chunk_idx", "chunk", F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    cand = (
        l.join(r, ["chunk_idx", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sha", "shb")
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
