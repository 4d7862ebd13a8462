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


def test_mixture_sample_exact_twin(spark):
    """mixture_sample == the pure-Python md5 recipe exactly: full
    copies unconditional, fractional copy iff md5-ppm(key, copy_idx,
    seed) < frac(w)·10⁶; unlisted sources dropped; copy_idx distinct."""
    import hashlib

    from lexicator_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [(i, f"text {i}", ["wiki", "web", "code", "junk"][i % 4])
         for i in range(400)],
        "doc_id long, text string, source string",
    )
    weights = {"wiki": 2.5, "web": 1.0, "code": 0.3, "junk": 0.0}
    seed = 7
    got = {
        (r.doc_id, r.copy_idx)
        for r in CU.mixture_sample(docs, weights, seed=seed).collect()
    }

    def ppm(doc_id, copy_idx):
        h = hashlib.md5(
            f"{doc_id}\x1f{copy_idx}\x1f{seed}".encode()
        ).hexdigest()
        return int(h[:8], 16) % 1_000_000

    expected = set()
    for i in range(400):
        src = ["wiki", "web", "code", "junk"][i % 4]
        w = weights[src]
        full, frac = int(w), round((w - int(w)) * 1_000_000)
        for c in range(full):
            expected.add((i, c))
        if frac > 0 and ppm(i, full) < frac:
            expected.add((i, full))
    assert got == expected

    # expected-rate sanity: wiki docs average ~2.5 copies, web exactly
    # 1, code ~0.3, junk 0
    n_wiki = sum(1 for d, _ in got if d % 4 == 0)
    assert 2.0 * 100 <= n_wiki <= 3.0 * 100
    assert sum(1 for d, _ in got if d % 4 == 1) == 100
    assert not any(d % 4 == 3 for d, _ in got)

    # a different seed moves the fractional picks but not the full copies
    got2 = {
        (r.doc_id, r.copy_idx)
        for r in CU.mixture_sample(docs, weights, seed=seed + 1).collect()
    }
    full_copies = {
        (d, c) for (d, c) in expected
        if c < int(weights[["wiki", "web", "code", "junk"][d % 4]])
    }
    assert full_copies <= got2
    assert got2 != got


def test_mixture_sample_plan_has_no_shuffle(spark):
    from lexicator_spark.operators import curation as CU

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        CU.mixture_sample(docs, {"src0": 1.5, "src1": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # output-proportional, shuffle-free
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pack_sequences_budget_validated(spark):
    """budget < 1 must fail loudly: non-ANSI Spark folds the
    divide-by-zero to a NULL bin for every row instead of an error."""
    import pytest

    docs = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="budget"):
        CU.pack_sequences(docs, budget=0)


def test_pack_sequences_orders_mixture_copies(spark):
    """mixture_sample output repeats doc_id across copies; packing it
    must break the order tie on copy_idx (deterministically), not on
    arbitrary task order — and carry copy_idx through to the output."""
    docs = spark.createDataFrame(
        [("d%02d" % i, "s", "w w w w") for i in range(6)],
        "doc_id string, source string, text string",
    )
    mixed = CU.mixture_sample(docs, {"s": 2.0})  # 2 copies per doc
    packed = CU.pack_sequences(CU.with_split(mixed), budget=10)
    assert "copy_idx" in packed.columns
    rows = sorted(
        (r.doc_id, r.copy_idx, r.bin, r.tokens_before) for r in packed.collect()
    )
    assert len(rows) == 12
    # copy ordering inside each doc is by copy_idx: the 0-copy always
    # packs at-or-before the 1-copy of the same doc
    by_doc = {}
    for doc, ci, b, tb in rows:
        by_doc.setdefault(doc, {})[ci] = tb
    for doc, copies in by_doc.items():
        assert copies[0] <= copies[1]
