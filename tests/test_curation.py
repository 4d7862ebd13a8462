"""Corpus curation: keep/drop decisions, drop-reason ordering, and
the content-hash train/val split."""

from __future__ import annotations

from lexicator_spark.operators import curation as CU
from lexicator_spark.operators import dedup as D

GOOD_EN = (
    "the quick brown fox jumps over a lazy dog and runs through "
    "bright green meadows chasing butterflies under warm skies"
)
GERMAN = "der hund und die katze laufen gemeinsam durch einen stillen wald"
# English-marked but degenerate: one repeated stopword → distinct and
# non-stopword ratios collapse, quality_bp far below any floor
SPAMMY = " ".join(["the"] * 30)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD_EN),
            (2, GOOD_EN),  # exact duplicate of 1
            (3, GERMAN),
            (4, "the dog"),  # English markers but < min_tokens
            (5, SPAMMY),
            (6, GOOD_EN + " while distant birds circle the quiet hills"),
        ],
        "doc_id long, text string",
    )


def test_curation_decisions(spark):
    docs = _docs(spark)
    clusters = D.near_dup_clusters(docs, method="jaccard", threshold=0.9,
                                   max_token_df=10**9)
    rows = {
        r.doc_id: r
        for r in CU.curate_corpus(
            docs, clusters=clusters, min_tokens=5, min_quality_bp=5000,
            allowed_langs=("en",), val_pct=10,
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert rows[1].keep and rows[1].drop_reason is None
    assert not rows[2].keep and rows[2].drop_reason == "duplicate"
    assert not rows[3].keep and rows[3].drop_reason == "lang"
    assert not rows[4].keep and rows[4].drop_reason == "too_short"
    assert not rows[5].keep and rows[5].drop_reason == "low_quality"
    assert rows[6].keep
    # content-hash split: identical texts land in the same split even
    # though one of them is dropped as a duplicate
    assert rows[1].split == rows[2].split
    assert all(r.split in ("train", "val") for r in rows.values())


def test_curation_scale_path_star_clusters(spark):
    """The uncapped composition: star-edge LSH clusters feeding
    curate_corpus — every doc decided, keeps ∪ duplicate-drops
    partition the near-dup graph exactly as the cluster table says."""
    docs = _docs(spark)
    clusters = D.near_dup_clusters(docs, method="minhash_star", threshold=0.9)
    out = CU.curate_corpus(docs, clusters=clusters).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5, 6}
    dup_drops = {r.doc_id for r in out if r.drop_reason == "duplicate"}
    cluster_drops = {r.doc_id for r in clusters.collect() if not r.keep}
    assert dup_drops == cluster_drops


def test_pack_sequences_contiguous_fill(spark):
    """budget=10, four 4-token docs: tokens_before 0,4,8,12 → bins
    0,0,0,1 (a doc straddling the boundary belongs to the bin its
    first token falls in); groups pack independently."""
    rows = [("a", i, "w x y z") for i in range(4)] + [
        ("b", 0, "p q"), ("b", 1, " ".join(["t"] * 9)), ("b", 2, "u v")
    ]
    docs = spark.createDataFrame(rows, "g string, doc_id long, text string")
    out = {
        (r.g, r.doc_id): (r.bin, r.tokens_before)
        for r in CU.pack_sequences(
            docs, budget=10, partition_cols=("g",)
        ).collect()
    }
    assert out == {
        ("a", 0): (0, 0), ("a", 1): (0, 4), ("a", 2): (0, 8), ("a", 3): (1, 12),
        ("b", 0): (0, 0), ("b", 1): (0, 2), ("b", 2): (1, 11),
    }


def test_split_is_content_deterministic(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.split for r in CU.with_split(docs).collect()}
    b = {r.doc_id: r.split for r in CU.with_split(docs).collect()}
    assert a == b
    # doc 1 and 2 share text → same bucket by construction
    assert a[1] == a[2]


def test_curation_contamination_gate(spark):
    """decontam report plugged into curate_corpus: contaminated docs
    drop with reason 'contaminated'; duplicate outranks contaminated
    in the first-failing order; docs absent from the report pass."""
    from lexicator_spark.operators import decontam as DC

    docs = _docs(spark)
    # eval set = an 8-token window of GOOD_EN → contaminates 1, 2, 6
    bench = spark.createDataFrame(
        [("b1", " ".join(GOOD_EN.split()[:8]))], ["bench_id", "text"]
    )
    report = DC.decontaminate(docs, bench, n=8)
    clusters = D.near_dup_clusters(docs, method="jaccard", threshold=0.9,
                                   max_token_df=10**9)
    rows = {
        r.doc_id: r
        for r in CU.curate_corpus(
            docs, clusters=clusters, min_tokens=5, min_quality_bp=5000,
            allowed_langs=("en",), val_pct=10, contamination=report,
        ).collect()
    }
    assert not rows[1].keep and rows[1].drop_reason == "contaminated"
    assert rows[2].drop_reason == "duplicate"  # outranks contaminated
    assert not rows[6].keep and rows[6].drop_reason == "contaminated"
    assert rows[3].drop_reason == "lang"  # clean doc: later gate fires

    # a partial report (some docs missing) treats absent docs as clean
    partial = report.filter("doc_id = 6")
    rows2 = {
        r.doc_id: r
        for r in CU.curate_corpus(
            docs, min_tokens=5, min_quality_bp=5000,
            allowed_langs=("en",), val_pct=10, contamination=partial,
        ).collect()
    }
    assert rows2[1].keep  # absent from report → clean
    assert rows2[6].drop_reason == "contaminated"
