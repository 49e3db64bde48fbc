"""Build dist/dhr_spark.zip for ``spark-submit --py-files`` deployment.

The north-rule deployment story (BASELINE.json): the engine ships to a
multi-executor cluster as a single zip importable on every executor's
PYTHONPATH. Usage:

    python scripts/package_pyfiles.py            # writes dist/dhr_spark.zip
    spark-submit --py-files dist/dhr_spark.zip scripts/build_index.py ...

Deterministic: files are added in sorted order with zeroed timestamps so the
artifact hash is reproducible build-to-build (byte-identical for identical
sources).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "dhr_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "dhr_spark")
    members = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in members:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    p = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
