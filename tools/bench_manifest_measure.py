"""Measure planning-time file pruning at scale (plans/manifest.py).

5M synthetic (url, domain, ts, v) rows written three ways — unordered,
ts-clustered, z-ordered on (ts, domain) — each with a min/max manifest;
then a 2.5% ts-slice and a single-domain query timed as (a) full scan +
filter, (b) pruned_read + filter. Prints file counts touched and best-of-2
wall times. Run on a quiet box: python tools/bench_manifest_measure.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logport_spark.plans.manifest import (cluster_write, fitted_rank32,
                                          monotone_rank32, prefix_rank32,
                                          pruned_files, pruned_read,
                                          write_manifest, zorder_write)
from logport_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_FILES = 256
TS_LO = 1_600_000_000
TS_HI = TS_LO + N
ROOT = "/root/repo/data/bench_manifest"


def rows(spark):
    """Page-shaped rows: the wide text payload (~960 B, low-compressibility
    md5 hex) is what makes file pruning a BYTES story, not just a
    task-count story — a crawl table's cost is its text/html columns."""
    return spark.range(N).select(
        F.concat(F.lit("https://d"),
                 F.pmod(F.xxhash64("id"), F.lit(4096)).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.concat(F.lit("d"), F.pmod(F.xxhash64("id"), F.lit(4096))
                 .cast("string"), F.lit(".example")).alias("domain"),
        (F.lit(TS_LO) + F.col("id")).alias("ts"),
        (F.col("id") * 7 % 1013).alias("v"),
        F.concat_ws("", F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda i: F.md5(F.concat(F.col("id").cast("string"),
                                     i.cast("string"))))).alias("text"))


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark("bench_manifest", cpus=32, shuffle_partitions=64)
    df = rows(spark)
    paths = {k: f"{ROOT}/{k}" for k in ("unordered", "zordered")}

    t0 = time.time()
    df.repartition(N_FILES, "v").write.mode("overwrite").parquet(
        paths["unordered"])
    t_un = time.time() - t0
    t0 = time.time()
    zorder_write(df, paths["zordered"],
                 monotone_rank32(F.col("ts"), TS_LO, TS_HI),
                 fitted_rank32(df, prefix_rank32(F.col("domain"))),
                 n_files=N_FILES)
    t_zo = time.time() - t0
    t_man = {}
    for k, p in paths.items():
        t0 = time.time()
        write_manifest(spark, p, ["ts", "domain"])
        t_man[k] = time.time() - t0
    print(f"write: unordered {t_un:.1f}s, zordered {t_zo:.1f}s, "
          f"manifests {t_man}")

    lo, hi = TS_LO + 1_000_000, TS_LO + 1_125_000  # 2.5% slice
    dom = "d777.example"

    # the query a curation pass actually runs: text bytes of the slice
    agg = [F.count(F.lit(1)), F.sum(F.length("text"))]
    for k, p in paths.items():
        nf_ts = len(pruned_files(spark, p, "ts", lo, hi))
        nf_dom = len(pruned_files(spark, p, "domain", dom, dom,
                                  numeric=False))
        full_ts = timed(lambda: spark.read.parquet(p)
                        .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
                        .agg(*agg).collect())
        pr_ts = timed(lambda: pruned_read(spark, p, "ts", lo, hi)
                      .filter((F.col("ts") >= lo) & (F.col("ts") < hi))
                      .agg(*agg).collect())
        full_dom = timed(lambda: spark.read.parquet(p)
                         .filter(F.col("domain") == dom)
                         .agg(*agg).collect())
        pr_dom = timed(lambda: pruned_read(spark, p, "domain", dom, dom,
                                           numeric=False)
                       .filter(F.col("domain") == dom)
                       .agg(*agg).collect())
        print(f"{k}: ts-slice files {nf_ts}/{N_FILES} "
              f"full {full_ts:.2f}s pruned {pr_ts:.2f}s | "
              f"domain-eq files {nf_dom}/{N_FILES} "
              f"full {full_dom:.2f}s pruned {pr_dom:.2f}s")


if __name__ == "__main__":
    main()
