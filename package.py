#!/usr/bin/env python
"""Build dist/docling_core_spark.zip for spark-submit --py-files.

Pure-python package -> one zip importable from executors; no install
step cluster-side. Deterministic (sorted entries, zeroed timestamps) so
re-builds of identical sources are byte-identical.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "docling_core_spark"


def build(dist_dir: str | None = None) -> str:
    dist_dir = dist_dir or os.path.join(ROOT, "dist")
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, f"{PKG}.zip")
    entries = []
    for base, _, files in os.walk(os.path.join(ROOT, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(base, f)
                entries.append((os.path.relpath(full, ROOT), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build())
