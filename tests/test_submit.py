"""Packaging for executor shipment (submit.py): the --py-files zip is
complete, standalone-importable, and printed by `-m` as documented."""

from __future__ import annotations

import subprocess
import sys
import zipfile


def test_pyfiles_zip_is_standalone_importable(tmp_path):
    from lexicator_spark.submit import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = set(zipfile.ZipFile(zip_path).namelist())
    # every package .py ships (spot the load-bearing ones)
    for must in (
        "lexicator_spark/__init__.py",
        "lexicator_spark/rules.py",
        "lexicator_spark/operators/extract.py",
        "lexicator_spark/streaming/ingest.py",
    ):
        assert must in names
    assert not any(n.endswith(".pyc") for n in names)
    # a FRESH interpreter with ONLY the zip on sys.path can import the
    # rule module a worker-side UDF closure resolves — the actual
    # --py-files contract
    r = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {zip_path!r}); "
         "from lexicator_spark import rules; print(rules.PRED_MENTIONS)"],
        capture_output=True, text=True, timeout=60, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip()


def test_submit_main_prints_zip_path(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "lexicator_spark.submit"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout.strip()
    assert out.endswith(".zip")
    assert zipfile.ZipFile(out).namelist()
