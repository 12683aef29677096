"""10M-page decade point (round 5, session 2): does pages/sec hold a
full decade past the scaling ladder's 1M-page input?

Two measurements on the same pages_sf10 table (10M pages, ~185M routed
records — the fourth decade of the flagship's scale story after
100k/sf0.1, 1M/sf1):

  * lp_pipeline  — the full parse→enrich→route→aggregate DAG
    (bench.pipeline_throughput, best-of-2, collect only the 7 metric rows)
  * curate_lines — curate_lines_corpus (the r5 fused boilerplate-strip +
    corpus line dedup) over the 10M-page text, noop sink; extends the
    1M-page fusion measurement (11.2s) a decade

Run: python tools/bench_decade10m.py   (prints one JSON line; numbers
land in BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from logport_spark import datagen  # noqa: E402
from logport_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # same session shape as bench.py / the scaling legs (shuffle = cores):
    # the first cut of this tool used shuffle_partitions=64 + an sf0.01-only
    # warm-up and read 66k pages/s at sf10 — HALF the matched-config rate
    # (133k) — a harness artifact, not a DAG property; measured 2026-08-19
    spark = get_spark("bench_decade10m", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    out: dict = {"metric": "decade_10m",
                 "load_avg_start": round(os.getloadavg()[0], 2)}

    sys.path.insert(0, "/root/repo")
    from bench import pipeline_throughput

    path = datagen.ensure_pages("10", spark=spark)

    # untimed warm-up at the PRIOR decade (JIT + codegen + Arrow workers
    # need big-batch evaluations to reach steady state — an sf0.01 warm-up
    # leaves the sf10 legs half-cold)
    dt1, np1, nr1 = pipeline_throughput(spark, "1")
    out["lp_pipeline_sf1"] = {
        "sec": round(dt1, 2), "pages_per_sec": round(np1 / dt1, 1),
        "records_per_sec": round(nr1 / dt1, 1)}
    spark.catalog.clearCache()

    dt, n_pages, n_rec = pipeline_throughput(spark, "10")
    out["lp_pipeline"] = {
        "sec": round(dt, 2), "n_pages": n_pages, "n_records": n_rec,
        "pages_per_sec": round(n_pages / dt, 1),
        "records_per_sec": round(n_rec / dt, 1),
    }

    from logport_spark.operators.dedup import curate_lines_corpus

    pages = spark.read.parquet(path).select("url", "text")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        (curate_lines_corpus(pages, min_docs=10, text_col="text",
                             id_col="url")
            .write.format("noop").mode("overwrite").save())
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    out["curate_lines"] = {"sec": round(best, 2),
                           "pages_per_sec": round(n_pages / best, 1)}
    out["load_avg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
