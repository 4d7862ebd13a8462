"""Materialize the deterministic synth transcript corpus as a
single-file parquet fixture (tests/fixtures/) so the DuckDB oracle and
the Spark contract queries read byte-identical input.

The fixture is fully regenerable (synth.make_corpus is seeded, no
wall-clock); tests/test_entry_queries.py asserts the committed file
still equals a fresh regeneration, so it can never drift silently.

Usage: python scripts/make_fixtures.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicator_spark import synth  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402

FIXTURE_N_CONVS = 300
FIXTURE_SEED = 42
FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    f"synth_corpus_n{FIXTURE_N_CONVS}_s{FIXTURE_SEED}.parquet",
)


def main() -> None:
    spark = get_spark(master="local[2]", shuffle_partitions=2,
                      app_name="make_fixtures")
    corpus = synth.make_corpus(n_convs=FIXTURE_N_CONVS, seed=FIXTURE_SEED)
    df = synth.corpus_df(spark, corpus)
    tmp = tempfile.mkdtemp(prefix="fixture_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
        shutil.copyfile(part, FIXTURE_PATH)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"wrote {FIXTURE_PATH} ({df.count()} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
