"""Benchmark harness (driver-run per round).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Also times the full KG pipeline (extract → link → canonicalize) over
a pre-generated synthetic transcript corpus (generation excluded from
timing) and reports turns/sec + triples/sec in the JSON extras.

Execution is forced with the noop sink (full plan, no driver
collect).  Every reported timing is MIN-OF-2 executions (see
``_best_of``) so round-over-round deltas are signal, not sandbox
noise.  Two-parallelism scaling evidence lives in
scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from lexicator_spark import synth  # noqa: E402
from lexicator_spark.operators import dedup as dedup_ops  # noqa: E402
from lexicator_spark.operators.canonicalize import (  # noqa: E402
    canonical_of_triples,
    connected_components,
)
from lexicator_spark.plans.pipeline import run_pipeline  # noqa: E402
from lexicator_spark.operators.extract import extract_triples, split_rejects  # noqa: E402
from lexicator_spark.operators.link import build_catalog, link_mentions  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q17_small_quantity_revenue",
    "window_running_sum",
    "window_topk_per_group",
    "time_bucket_agg",
    "asof_join_events",
    "kg_mention_spans",
    "kg_span_proximity_pairs",
    "kg_khop_reachable",
    "kg_negative_samples",
    "kg_connected_components",
    "dedup_tokenset",
    "dedup_minhash_clusters",
    "dedup_embedding_cosine",
    "ann_cosine_top1",
    "ann_lsh_top1",
    "text_stats",
    "pii_scrub",
    "dedup_paragraphs",
    "mixture_sample",
    "corpus_pack_sequences",
    # uncapped on the full documents table: the eval-set n-gram side is
    # broadcast, so this measures the corpus-side single-projection scan
    "corpus_decontaminate",
]
# r3→r4 renames (registry reconciliation): kg_extract_mentions →
# kg_mention_spans (same extraction + span struct); text_quality +
# text_token_count_bpe + doc_fingerprint_rolling → text_stats (one
# pass, all columns); dedup_minhash_lsh (capped pair form) dropped —
# superseded by the uncapped dedup_minhash_clusters.

KG_N_CONVS = int(os.environ.get("BENCH_KG_CONVS", "300000"))  # ~1M turns


def _calibration() -> dict:
    """Fixed single-box microbenchmarks run before Spark starts, so
    round-over-round bench deltas can be normalized against the
    sandbox's noisy-neighbor variance (r4 saw the same pytest suite
    take 6:47 one session and 12:00 the next).  Two probes: a BLAS
    matmul (whole-box: memory bandwidth + all cores) and a GIL-bound
    pure-Python hash loop (single-core clock/steal).  Deterministic
    inputs, min-of-3 — a calibration that itself wobbles is useless."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((1024, 1024))
    b = rng.random((1024, 1024))

    def matmul():
        for _ in range(8):
            a @ b

    def hash_loop():
        x = 0
        for i in range(3_000_000):
            x ^= hash((i, "cal"))
        return x

    return {
        "numpy_matmul_sec": _best_of(matmul, n=3),
        "py_hash_loop_sec": _best_of(hash_loop, n=3),
    }


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best_of(fn, n: int = 2) -> float:
    """Min-of-n wall time: the sandbox shows ±30% run-to-run noise, so
    single-shot timings make round-over-round deltas meaningless.  The
    min is the least-noisy estimator of the plan's true cost (noise is
    strictly additive here — no cache to get unrealistically warm that
    a second run would hide, since every run re-executes the full plan
    against the same on-disk parquet)."""
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def run_kg_pipeline(spark, corpus_path: str) -> dict:
    turns = spark.read.parquet(corpus_path)
    n_turns = turns.count()
    t0 = time.monotonic()
    # stage boundaries materialized (localCheckpoint), mirroring the
    # real pipeline's per-stage Iceberg/parquet writes — downstream
    # branches must not recompute extraction
    triples, _ = split_rejects(extract_triples(turns))
    triples = triples.localCheckpoint(eager=True)
    same_as = link_mentions(triples, build_catalog(spark)).localCheckpoint(eager=True)
    assignments = connected_components(
        same_as.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
    )
    canonical = canonical_of_triples(assignments)
    all_triples = triples.unionByName(same_as).unionByName(canonical)
    n_triples = all_triples.count()
    wall = time.monotonic() - t0
    return {
        "kg_pipeline_sec": round(wall, 3),
        "kg_n_turns": n_turns,
        "kg_n_triples": n_triples,
        "kg_turns_per_sec": round(n_turns / wall, 1),
        "kg_triples_per_sec": round(n_triples / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    calibration = _calibration()  # before the JVM exists: pure box probe
    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench", shuffle_partitions=cpus
    )

    # pre-generate the KG bench corpus outside the timed section
    corpus_path = os.environ.get(
        "BENCH_KG_CORPUS", f"/tmp/bench_kg_corpus_{KG_N_CONVS}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        shutil.rmtree(corpus_path, ignore_errors=True)
        synth.write_corpus_parquet(spark, corpus_path, n_convs=KG_N_CONVS)

    # JVM/Arrow warm-up + Python-worker spawn (not timed) — queries
    # using pandas UDFs (LSH bucket codes) measure steady state
    _force(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1000))
    _force(
        spark.range(1000)
        .toDF("x")
        .select(F.pandas_udf(lambda s: s + 1, "long")(F.col("x")))
    )

    # retired-from-snapshot queries stay benchable (round-over-round
    # comparability: dedup_tokenset has a BENCH row since r1)
    qs = dict(entrymod.queries())
    qs.update({n: fn for n, (fn, _sql) in entrymod.retired_oracles().items()})
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        timings[name] = _best_of(lambda: _force(qs[name](spark, sf_dir)))

    # full-table dedup signature stages (the pair queries cap their doc
    # count because the synthetic corpus is ~50% true near-dup pairs;
    # the signature computation is the part that must scale to 100 TB)
    docs_full = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for name, fn in (
        ("minhash_signatures_full", dedup_ops.minhash_signatures),
        ("simhash_fingerprints_full", dedup_ops.simhash_fingerprints),
    ):
        _force(fn(docs_full))  # warm-up: codegen compile of the 32/64-agg plan
        timings[name] = _best_of(lambda: _force(fn(docs_full)))

    # flagship LLM-data composition on the FULL documents table:
    # star-edge LSH clustering → curation gate → bucket-scoped packing
    # (the linear 100-TB shapes end-to-end), with its own wall/row
    # headline next to the KG pipeline's
    from lexicator_spark.operators import curation as CU

    def run_curation_full():
        clusters = dedup_ops.near_dup_clusters(
            docs_full, method="minhash_star", threshold=0.6
        )
        cur = CU.curate_corpus(docs_full, clusters)
        kept = docs_full.join(
            cur.filter(F.col("keep")).select("doc_id", "split"), "doc_id"
        ).withColumn("p_bucket", F.pmod(F.col("doc_id"), F.lit(8)))
        _force(
            CU.pack_sequences(
                kept, budget=2048, partition_cols=("split", "p_bucket")
            )
        )

    timings["corpus_curation_full"] = _best_of(run_curation_full)
    n_docs_full = docs_full.count()

    kg = min(
        (run_kg_pipeline(spark, corpus_path) for _ in range(2)),
        key=lambda r: r["kg_pipeline_sec"],
    )
    timings["kg_pipeline"] = kg["kg_pipeline_sec"]

    # write-inclusive twin: the SAME stages through run_pipeline's real
    # parquet stage tables (materialization + lineage + checkpoints),
    # so the headline localCheckpoint number never stands alone
    mat_root = "/tmp/bench_kg_materialized"
    turns_df = spark.read.parquet(corpus_path)

    def run_materialized():
        shutil.rmtree(mat_root, ignore_errors=True)
        run_pipeline(spark, turns_df, mat_root, resume=False)

    # rmtree inside the timed fn: recreating the stage tables IS the
    # measured work; the delete is a negligible local-fs rm
    mat_wall = _best_of(run_materialized)
    kg["kg_pipeline_materialized_sec"] = round(mat_wall, 3)
    kg["kg_turns_per_sec_materialized"] = round(kg["kg_n_turns"] / mat_wall, 1)
    timings["kg_pipeline_materialized"] = kg["kg_pipeline_materialized_sec"]
    kg["curation_full_docs"] = n_docs_full
    kg["curation_full_docs_per_sec"] = round(
        n_docs_full / timings["corpus_curation_full"], 1
    )

    # ── incremental refresh (SURVEY §2.1 #2, the RecentChanges
    # analog): ~1% of conversations gain one turn; the refresh
    # rewrites only the touched p_hash buckets of the materialized
    # Stage-A table.  Min-of-2 over two DISJOINT 1% deltas — each
    # timed run does real work (repeating the same delta would be a
    # frontier no-op).  Comparator = the exact work refresh replaces:
    # full Stage-A re-extract + bucketed write of the same corpus.
    from pyspark.sql import Window as W  # noqa: E402

    from lexicator_spark.operators.incremental import (  # noqa: E402
        refresh_triples_partitioned,
    )
    from lexicator_spark.sources import io as sio  # noqa: E402

    raw_path = os.path.join(mat_root, "triples_raw")
    last_turns = (
        turns_df.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("conv_id").orderBy(F.desc("turn_idx"))),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    turns_now = turns_df

    # ── end-to-end incremental refresh (plans/refresh.py): the same
    # sparse RecentChanges-shaped delta, but EVERY stage table updated
    # O(delta) — Stage B links only newly-seen surfaces, Stage C
    # merges/splits only delta-adjacent components, materialize
    # upserts only touched buckets, entities rebuilds from the
    # _surface_stats rollup.  Comparator = kg_pipeline_materialized
    # (the full five-stage rebuild this replaces).  Run FIRST, while
    # mat_root's downstream stages are still consistent with its raw
    # table (the stage-A-only refresh loops below leave them stale by
    # design); min-of-2 over disjoint deltas, so run 1 absorbs the
    # one-time _surface_stats bootstrap and run 2 is steady state.
    from lexicator_spark.plans.refresh import refresh_pipeline

    e2e_walls = []
    e2e_meta = None
    for mod in (6, 7):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        r = refresh_pipeline(spark, turns_now, mat_root)
        e2e_walls.append(round(time.monotonic() - t0, 3))
        e2e_meta = (r.n_changed, r.surfaces_added, r.surfaces_removed)
    timings["refresh_e2e_sparse"] = min(e2e_walls)
    kg["refresh_e2e_n_changed"] = e2e_meta[0]
    kg["refresh_e2e_surfaces_added"] = e2e_meta[1]
    kg["refresh_e2e_surfaces_removed"] = e2e_meta[2]
    kg["refresh_e2e_vs_materialized_ratio"] = round(
        mat_wall / timings["refresh_e2e_sparse"], 2
    )

    refresh_walls = []
    refresh_meta = None
    for mod in (0, 1):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(100)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        res = refresh_triples_partitioned(spark, turns_now, raw_path)
        refresh_walls.append(round(time.monotonic() - t0, 3))
        # keep the LAST run's meta: run 1 bootstraps the frontier from
        # the triples table, which over-flags conversations whose tail
        # turns emitted no triples; run 2 reads the persisted frontier
        # and reflects the true steady-state delta
        refresh_meta = (res.n_changed, res.n_buckets_touched)
    timings["refresh_1pct"] = min(refresh_walls)

    # sparse delta — the RecentChanges-shaped case the feature exists
    # for: a handful of changed conversations per refresh tick (~10
    # convs here) touches only their own p_hash buckets, so rewrite
    # volume scales with the touched fraction.  The scattered-1% case
    # above is the degradation bound: 3k conversations hash into all
    # 64 buckets and the upsert correctly falls back to ~full rewrite
    # plus delta bookkeeping.  (mods 2/3 at 30000 are disjoint from
    # the mod-100 ∈ {0,1} slices already refreshed above.)
    sparse_walls = []
    sparse_meta = None
    for mod in (2, 3):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        res = refresh_triples_partitioned(spark, turns_now, raw_path)
        sparse_walls.append(round(time.monotonic() - t0, 3))
        sparse_meta = (res.n_changed, res.n_buckets_touched)
    timings["refresh_sparse"] = min(sparse_walls)

    # same sparse shape, feed mode: the changed conv_ids are SUPPLIED
    # (lexicator's RecentChanges poll names changed pages) so the
    # snapshot-wide detection aggregate is skipped — at bench scale
    # the two modes are close, at 29M turns feed mode is the
    # difference between O(delta) and O(corpus) (BENCH/BASELINE.md)
    feed_walls = []
    feed_meta = None
    for mod in (4, 5):
        extra = last_turns.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(30_000)) == mod
        ).withColumn("turn_idx", F.col("turn_idx") + 1)
        feed = extra.select("conv_id").distinct().localCheckpoint(eager=True)
        turns_now = turns_now.unionByName(extra).localCheckpoint(eager=True)
        t0 = time.monotonic()
        res = refresh_triples_partitioned(
            spark, turns_now, raw_path, change_feed=feed
        )
        feed_walls.append(round(time.monotonic() - t0, 3))
        feed_meta = (res.n_changed, res.n_buckets_touched)
    timings["refresh_sparse_feed"] = min(feed_walls)

    scratch = "/tmp/bench_stage_a_full"

    def full_stage_a():
        shutil.rmtree(scratch, ignore_errors=True)
        good, _ = split_rejects(extract_triples(turns_now))
        sio.write_table(good, scratch, partition_key="conv_id")

    timings["extract_full_rebuild"] = _best_of(full_stage_a)
    shutil.rmtree(scratch, ignore_errors=True)
    kg["refresh_n_changed"] = refresh_meta[0]
    kg["refresh_buckets_touched"] = refresh_meta[1]
    kg["refresh_vs_full_ratio"] = round(
        timings["extract_full_rebuild"] / timings["refresh_1pct"], 2
    )
    kg["refresh_sparse_n_changed"] = sparse_meta[0]
    kg["refresh_sparse_buckets_touched"] = sparse_meta[1]
    kg["refresh_sparse_vs_full_ratio"] = round(
        timings["extract_full_rebuild"] / timings["refresh_sparse"], 2
    )
    kg["refresh_sparse_feed_n_changed"] = feed_meta[0]
    kg["refresh_sparse_feed_vs_full_ratio"] = round(
        timings["extract_full_rebuild"] / timings["refresh_sparse_feed"], 2
    )

    # ── streaming throughput: rows/s through the buffered
    # (out-of-order-safe) replies operator — file source, availableNow,
    # noop sink.  Input (11 data files + 2 watermark sentinels, built
    # outside timing) is laid out so the first sentinel shares the
    # last data micro-batch and the second forms its own final batch:
    # the advanced watermark then fires every event-time timeout, so
    # the wall INCLUDES draining the buffered state, not just
    # absorbing rows into it.
    import glob  # noqa: E402
    from datetime import timedelta  # noqa: E402

    from lexicator_spark.streaming import ingest  # noqa: E402

    stream_in = "/tmp/bench_stream_in"
    ckpt = "/tmp/bench_stream_ckpt"
    sub = turns_df.filter(F.pmod(F.xxhash64("conv_id"), F.lit(10)) == 0)
    if not os.path.exists(os.path.join(stream_in, "_ready")):
        shutil.rmtree(stream_in, ignore_errors=True)
        sub.repartition(11).write.parquet(stream_in)
        far = synth.EPOCH + timedelta(days=90)
        for i, ts in enumerate((far, far + timedelta(days=1))):
            staging = f"/tmp/bench_stream_sentinel_{i}"
            shutil.rmtree(staging, ignore_errors=True)
            synth.corpus_df(
                spark,
                synth.Corpus(rows=[("wm_sentinel", i, "user", "advance", None, ts)]),
            ).coalesce(1).write.parquet(staging)
            part = glob.glob(staging + "/part-*.parquet")[0]
            dst = os.path.join(stream_in, f"zz_sentinel_{i}.parquet")
            shutil.copy(part, dst)
            t = time.time() + 100 + i  # late mtimes: sentinels batch last
            os.utime(dst, (t, t))
            shutil.rmtree(staging, ignore_errors=True)
        open(os.path.join(stream_in, "_ready"), "w").close()
    n_stream_turns = sub.count()

    def run_stream():
        shutil.rmtree(ckpt, ignore_errors=True)
        # 6 files/trigger → 3 micro-batches over the 13 files: [6 data],
        # [5 data + sentinel-1], [sentinel-2] — cross-batch state is
        # exercised while per-batch state-commit overhead stays small
        stream = (
            spark.readStream.schema(ingest.TURN_SCHEMA)
            .option("maxFilesPerTrigger", 6)
            .parquet(stream_in)
        )
        q = (
            ingest.stateful_replies_stream_buffered(stream, watermark_delay="2 days")
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not drain in 600s"

    timings["stream_replies_buffered"] = _best_of(run_stream)
    kg["stream_input_turns"] = n_stream_turns
    kg["stream_replies_rows_per_sec"] = round(
        n_stream_turns / timings["stream_replies_buffered"], 1
    )

    # both extraction impls, for the native-vs-pandas tradeoff record;
    # warm the Python workers first (since the dedup signatures went
    # JVM-side, nothing before this point spawns them — steady-state
    # is what the comparison is about)
    big_turns = spark.read.parquet(corpus_path)
    _force(extract_triples(big_turns.limit(20_000), impl="pandas"))
    for impl in ("native", "pandas"):
        timings[f"kg_extract_{impl}"] = _best_of(
            lambda: _force(extract_triples(big_turns, impl=impl))
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": kg,
                "cpus": cpus,
                "calibration": calibration,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
