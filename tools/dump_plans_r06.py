#!/usr/bin/env python
"""Dump .explain("formatted") for the round-6 touched queries into
plans/r06/<query>_<label>.txt (label = "before" at the round-start commit,
"after" at HEAD). The judge checks plan claims against these files.

Usage: python tools/dump_plans_r06.py before|after [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"

QUERIES = [
    "line_dedup_corpus", "domain_boilerplate", "web_curation",
    "strip_boilerplate", "dedup_clusters", "cluster_retention",
]


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        raise SystemExit(__doc__)
    label = sys.argv[1]
    names = sys.argv[2:] or QUERIES
    from logport_spark.session import get_spark

    import __spark_entry__ as em

    qs = {**em.queries(), **em.baseline_queries()}
    spark = get_spark("dump_plans_r06")
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{label}.txt", "w") as f:
            f.write(txt)
        print(f"plans/r06/{name}_{label}.txt: "
              f"{txt.count('Exchange')} Exchange mentions")
    spark.stop()


if __name__ == "__main__":
    main()
