"""Dump .explain('formatted') for the r6-touched queries to
plans/r06/<query>_{before,after}.txt.

Usage: python scripts/dump_plans_r06.py <repo_root> <suffix> [query ...]
  repo_root — tree to import __spark_entry__ from (/tmp/r5tree for
              'before', /root/repo for 'after')
  suffix    — 'before' | 'after'
Output always lands in /root/repo/plans/r06/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)

import __spark_entry__ as E  # noqa: E402
from lexicator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r06"
os.makedirs(OUT, exist_ok=True)

spark = get_spark(master="local[8]", shuffle_partitions=8)
qs = dict(E.queries())
qs.update({n: fn for n, (fn, _s) in E.retired_oracles().items()})
for name in names:
    df = qs[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path, flush=True)
spark.stop()
