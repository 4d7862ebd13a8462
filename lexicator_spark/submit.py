"""Packaging for executor shipment — the ``spark-submit --py-files``
story (north_rule: "launches via spark-submit --py-files on
multi-executor clusters").

``build_pyfiles_zip`` produces the archive to pass to ``--py-files``;
``ship_package`` attaches it to a live session (``addPyFile``) so
Python workers can import ``lexicator_spark`` no matter where the
driver process started — the UDF closures reference the package's
rule module, which must resolve on every executor.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str | None = None) -> str:
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "lexicator_spark_pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "lexicator_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return out_path


def ship_package(spark) -> str:
    path = build_pyfiles_zip()
    spark.sparkContext.addPyFile(path)
    return path


if __name__ == "__main__":
    # the documented launch idiom:
    #   spark-submit --py-files $(python -m lexicator_spark.submit) ...
    print(build_pyfiles_zip())
