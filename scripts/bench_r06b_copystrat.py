"""Probe: fastest Hadoop-FS-generic way to copy 64 bucket dirs.

Strategies: (a) serial per-bucket FileUtil.copy (baseline), (b) ONE
batched FileUtil.copy(Path[], dst), (c) 16-thread per-bucket copies.
"""
from __future__ import annotations

import os
import shutil
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lexicator_spark.session import get_spark  # noqa: E402

SRC = "/tmp/probe_matcopy_root/triples_raw"


def main() -> None:
    spark = get_spark(master="local[4]", app_name="copystrat")
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001

    def jpath(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = jpath(SRC).getFileSystem(conf)
    bucket_paths = [
        st.getPath()
        for st in fs.listStatus(jpath(SRC))
        if st.getPath().getName().startswith("p_hash=")
    ]
    print(f"{len(bucket_paths)} bucket dirs")

    def timed(name, fn):
        for i in range(2):
            tgt = f"/tmp/probe_copystrat_{name}"
            shutil.rmtree(tgt, ignore_errors=True)
            os.makedirs(tgt, exist_ok=True)
            t0 = time.monotonic()
            fn(tgt)
            print(f"{name} run{i}: {time.monotonic() - t0:.3f}s")

    def serial(tgt):
        for p in bucket_paths:
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, p, fs, jpath(os.path.join(tgt, p.getName())),
                False, True, conf,
            )

    def batched(tgt):
        gw = spark.sparkContext._gateway  # noqa: SLF001
        arr = gw.new_array(jvm.org.apache.hadoop.fs.Path, len(bucket_paths))
        for i, p in enumerate(bucket_paths):
            arr[i] = p
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            fs, arr, fs, jpath(tgt), False, True, conf
        )

    def threaded(tgt):
        def one(p):
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, p, fs, jpath(os.path.join(tgt, p.getName())),
                False, True, conf,
            )
        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(one, bucket_paths))

    timed("serial", serial)
    timed("batched", batched)
    timed("threaded", threaded)

    # verify one strategy's output matches source listing
    n = sum(
        1 for st in fs.listStatus(jpath("/tmp/probe_copystrat_batched"))
        if st.getPath().getName().startswith("p_hash=")
    )
    print(f"batched target bucket dirs: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
