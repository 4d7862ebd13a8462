"""Benchmark decontamination (operators/decontam.py): exact parity
with a pure-Python twin on the sf0.001 documents table, plan-shape
assertions (broadcast join, zero Python UDFs), and the short-doc /
min_hits edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lexicator_spark.operators import decontam as DC

SF_DIR = "/root/testdata/sf0.001"
N = 8


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def evalset(spark, docs):
    """Eval set with guaranteed overlap: a 12-token mid-document
    snippet from every 25th doc (each contains 5 of that doc's
    8-grams), plus two rows that cannot collide with anything."""
    snippets = [
        (int(r["doc_id"]), " ".join(r["text"].split()[2:14]))
        for r in docs.filter(F.col("doc_id") % 25 == 0).collect()
    ]
    rows = [(f"bench_{d}", s) for d, s in snippets] + [
        ("bench_miss_1", "zq xv qj wk vx jz kq xw " * 2),
        ("bench_miss_2", "short row"),
    ]
    return spark.createDataFrame(rows, ["bench_id", "text"])


def test_decontaminate_matches_python_twin(spark, docs, evalset):
    got = {
        r["doc_id"]: (r["n_doc_ngrams"], r["n_hits"], r["contam_frac"], r["is_contaminated"])
        for r in DC.decontaminate(docs, evalset, n=N).collect()
    }

    bench_set = set()
    for r in evalset.collect():
        bench_set |= _py_ngrams(r["text"], N)
    expected = {}
    for r in docs.collect():
        grams = _py_ngrams(r["text"], N)
        hits = len(grams & bench_set)
        frac = hits / len(grams) if grams else 0.0
        expected[r["doc_id"]] = (len(grams), hits, frac, hits >= 1)

    assert set(got) == set(expected)
    for doc_id, (n_grams, hits, frac, flag) in expected.items():
        g = got[doc_id]
        assert g[0] == n_grams, doc_id
        assert g[1] == hits, doc_id
        assert g[2] == pytest.approx(frac), doc_id
        assert g[3] == flag, doc_id

    # the planted snippets must actually flag their source docs, and
    # contamination must be the exception, not the rule
    flagged = {d for d, v in expected.items() if v[3]}
    assert {d for d in range(0, 500, 25)} <= flagged
    assert len(flagged) < 100


def test_min_hits_threshold(spark, docs, evalset):
    """min_hits=6 cannot be met by a 12-token snippet (5 shared
    8-grams) unless the doc collides beyond its own snippet."""
    strict = DC.decontaminate(docs, evalset, n=N, min_hits=6)
    loose = DC.decontaminate(docs, evalset, n=N, min_hits=1)
    n_strict = strict.filter("is_contaminated").count()
    n_loose = loose.filter("is_contaminated").count()
    assert n_strict < n_loose
    # rows below the threshold keep their hit counts — the report is
    # the same, only the verdict moves
    joined = (
        strict.select("doc_id", F.col("n_hits").alias("h1"))
        .join(loose.select("doc_id", F.col("n_hits").alias("h2")), "doc_id")
        .filter("h1 <> h2")
    )
    assert joined.count() == 0


def test_short_docs_cannot_collide(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, None), (3, "a b c d e f g h")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([("b1", "a b c d e f g h")], ["bench_id", "text"])
    rows = {r["doc_id"]: r for r in DC.decontaminate(docs, bench, n=N).collect()}
    assert rows[1]["n_doc_ngrams"] == 0 and rows[1]["contam_frac"] == 0.0
    assert not rows[1]["is_contaminated"]
    assert rows[2]["n_doc_ngrams"] == 0 and not rows[2]["is_contaminated"]
    assert rows[3]["n_doc_ngrams"] == 1 and rows[3]["n_hits"] == 1
    assert rows[3]["is_contaminated"] and rows[3]["contam_frac"] == 1.0


def test_plan_broadcasts_benchmark_and_stays_jvm(spark, docs, evalset):
    plan = DC.decontaminate(docs, evalset, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # ONE corpus pass: the docs parquet is scanned exactly once (the
    # two-pass base+hits design would scan it twice)
    assert plan.count("Scan parquet") == 1
    # map-side combine: Spark's two-phase aggregation (partial_count
    # below the exchange) so ~one row per doc crosses the shuffle,
    # not one per gram
    assert "partial_count" in plan


def test_cli_decontam_verb(spark, tmp_path):
    """--decontam runs the collision gate instead of the KG pipeline:
    per-doc report parquet written to --out, JSON summary on stdout."""
    import json
    import subprocess
    import sys

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten"),
         (2, "totally different words with no overlap whatsoever here now")],
        "doc_id long, text string",
    ).write.parquet(docs_path)
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [("b1", "two three four five six seven eight nine")],
        "bench_id string, text string",
    ).write.parquet(bench_path)
    out = str(tmp_path / "report")
    r = subprocess.run(
        [sys.executable, "-m", "lexicator_spark",
         "--input", docs_path, "--out", out,
         "--decontam", bench_path, "--ngram", "8", "--cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    stats = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")][-1]
    assert stats == {"decontam_ngram": 8, "min_hits": 1, "docs": 2,
                     "contaminated": 1, "out": out}
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert rows[1].is_contaminated and rows[1].n_hits == 1
    assert not rows[2].is_contaminated and rows[2].n_hits == 0
