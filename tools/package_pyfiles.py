"""Package the engine for ``spark-submit --py-files``.

Builds ``dist/proj_spark.zip`` containing the ``proj_spark`` package
plus the ``__spark_entry__`` module — the artifact a cluster submit
ships to every executor (north rule: "run via spark-submit --py-files
on a multi-executor cluster").  Pure stdlib; deterministic member
order so repeated builds hash identically.

Usage: python tools/package_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "proj_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    members: list[tuple[str, str]] = []
    pkg_root = os.path.join(REPO, "proj_spark")
    for base, _dirs, files in os.walk(pkg_root):
        for fn in files:
            # .gsb/.gtx: grid fixtures under proj_spark/data ride the
            # zip so executors can resolve bare grid names (grids.py,
            # vgrids.py)
            if not fn.endswith((".py", ".gsb", ".gtx")):
                continue
            full = os.path.join(base, fn)
            members.append((full, os.path.relpath(full, REPO)))
    members.append((os.path.join(REPO, "__spark_entry__.py"),
                    "__spark_entry__.py"))
    members.sort(key=lambda m: m[1])
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in members:
            # fixed timestamp -> byte-identical archive for identical
            # sources (lineage-friendly artifact hashing)
            zi = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            with open(full, "rb") as fh:
                z.writestr(zi, fh.read(), zipfile.ZIP_DEFLATED)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
