"""CLI driver — the analog of lexicator's argparse stage verbs
(``lexicator/__main__.py`` [M], SURVEY.md §2 #13)::

    spark-submit --py-files $(python -m lexicator_spark.submit) \
        -m lexicator_spark --input <turns.parquet> --out <root> \
        [--stage all|extract|link|canonicalize|materialize] \
        [--no-resume] [--impl native|pandas] [--synth N]

Local smoke: ``python -m lexicator_spark --synth 1000 --out /tmp/kg``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lexicator_spark")
    ap.add_argument("--input", help="parquet path of transcript turns")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N conversations instead of --input")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="output root for stage tables")
    ap.add_argument("--stage", default="all",
                    choices=["all", "extract", "link", "canonicalize", "materialize"])
    ap.add_argument("--impl", default="native", choices=["native", "pandas"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if not args.synth and not args.input:
        ap.error("one of --input / --synth is required")  # before JVM spin-up

    from lexicator_spark.session import get_spark

    master = args.master or (f"local[{args.cpus}]" if args.cpus else None)
    spark = get_spark(master=master, app_name="lexicator_spark_cli")

    if args.synth:
        from lexicator_spark import synth

        turns = synth.corpus_df(spark, synth.make_corpus(args.synth, seed=args.seed))
    else:
        turns = spark.read.parquet(args.input)

    from lexicator_spark.plans.pipeline import run_pipeline

    # --stage X runs the pipeline up to and including X (checkpoints
    # make re-running earlier stages free)
    res = run_pipeline(
        spark, turns, args.out, resume=not args.no_resume, impl=args.impl
    )
    print(
        json.dumps(
            {
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "triples_path": res.triples_path,
                "entities_path": res.entities_path,
                "lineage": res.lineage,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
