"""Cluster-real submit path: package the engine into a --py-files zip
and run a query through a REAL spark-submit subprocess from a neutral
cwd, so only the shipped artifact provides the code (north rule: "run
via spark-submit --py-files").
"""

import hashlib
import json
import subprocess
import sys
import os
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package_pyfiles

    z1 = package_pyfiles.build(str(tmp_path / "a.zip"))
    z2 = package_pyfiles.build(str(tmp_path / "b.zip"))
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert h(z1) == h(z2)
    # the artifact must carry the package and the driver entry module
    import zipfile

    names = zipfile.ZipFile(z1).namelist()
    assert "__spark_entry__.py" in names
    assert any(n.startswith("proj_spark/") for n in names)


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package_pyfiles

    z = package_pyfiles.build(str(tmp_path / "proj_spark.zip"))
    out = str(tmp_path / "out")
    r = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", z,
         os.path.join(REPO, "tools", "submit_main.py"),
         "--query", "q14_cell_agg",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        cwd=tempfile.gettempdir(),  # neutral cwd: the zip must suffice
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("METRICS ")]
    assert line, r.stdout[-2000:]
    m = json.loads(line[0][len("METRICS "):])
    assert m["rows"] > 0
    # metrics table written next to the result (lineage companion)
    assert os.path.isdir(f"{out}/result") and os.path.isdir(f"{out}/metrics")


def test_spark_submit_grid_shift_ships_in_zip(tmp_path):
    """The NTv2 fixture must reach executors through the --py-files
    zip alone (grids.load_grid resolves bare names inside the shipped
    proj_spark/data): run q05_hgridshift via a REAL spark-submit from
    a neutral cwd — if the .gsb didn't ride the artifact, every row
    would fail at Transform construction on the worker."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package_pyfiles

    z = package_pyfiles.build(str(tmp_path / "proj_spark.zip"))
    out = str(tmp_path / "out_grid")
    r = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", z,
         os.path.join(REPO, "tools", "submit_main.py"),
         "--query", "q05_hgridshift",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        cwd=tempfile.gettempdir(),
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("METRICS ")]
    assert line, r.stdout[-2000:]
    m = json.loads(line[0][len("METRICS "):])
    assert m["rows"] == 1500
