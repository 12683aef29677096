"""spark-submit --py-files packaging evidence (north_rule).

Builds out/logport_spark.zip and runs the full parse→enrich→route pipeline
in a CLEAN subprocess whose only source of the package is the zip — the
same zipimport mechanism spark-submit uses to ship --py-files to executors.
The repo root is deliberately absent from the child's sys.path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pipeline_runs_from_pyfiles_zip(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "logport_spark.zip"))

    child = textwrap.dedent("""
        import sys
        # The package must resolve from the zip (zipimport), not the repo.
        import logport_spark
        assert ".zip" in logport_spark.__file__, logport_spark.__file__

        from logport_spark.session import get_spark
        from logport_spark import datagen
        from logport_spark.plans.pipeline import parsed_routed, sink_metrics

        spark = get_spark("pyfiles_smoke", cpus=4)
        import pandas as pd
        pages = spark.createDataFrame(
            pd.DataFrame(datagen.gen_docs(range(50))), schema=datagen.PAGES_DDL)
        m = sink_metrics(parsed_routed(spark, pages)).collect()
        assert sum(r["rows_routed"] for r in m) > 0
        print("ZIPRUN_OK", sum(r["rows_routed"] for r in m))
    """)
    script = tmp_path / "child.py"
    script.write_text(child)

    env = dict(os.environ)
    env["PYTHONPATH"] = zip_path  # the zip is the ONLY package source
    env["LOGPORT_SPARK_DATA_DIR"] = str(tmp_path / "data")
    r = subprocess.run(
        [sys.executable, str(script)], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ZIPRUN_OK" in r.stdout
