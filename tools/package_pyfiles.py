#!/usr/bin/env python
"""Build the spark-submit --py-files artifact: out/logport_spark.zip.

The north rule requires the pipeline be runnable via
`spark-submit --py-files` on a multi-executor cluster. This packages the
pure-Python `logport_spark` package (no data, no caches) into a zip that
executors can import, plus `tools/submit_run.py` as the driver script:

    python tools/package_pyfiles.py
    spark-submit --py-files out/logport_spark.zip tools/submit_run.py \
        run --pages <dir> --out <dir>

Verified by tests/test_packaging.py, which imports the pipeline from the
zip alone (sys.path zipimport — the same mechanism spark-submit uses on
executors) in a clean subprocess.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "logport_spark")
OUT = os.path.join(REPO, "out", "logport_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else OUT)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path} ({n} modules)")
