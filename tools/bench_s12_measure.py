"""One-off scale measurements for the s12 operators (results land in
BENCH/BASELINE.md): sampled quantiles vs exact percentile at 5M/50M rows,
and the bucketed co-located join vs the plain shuffled join at 1M rows
per side (the doc_id-keyed score-table join every curation cascade pays).

Run: python tools/bench_s12_measure.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logport_spark.session import get_spark  # noqa: E402


def t(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def quantile_ladder(spark):
    from logport_spark.operators.sketches import sampled_quantiles

    print("== sampled_quantiles vs exact percentile ==")
    for n in (5_000_000, 50_000_000):
        df = (spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 64).cast("string").alias("g"),
            ((F.col("id") * 2654435761 % 1_000_003) / F.lit(997.0))
                .alias("value"))
            .localCheckpoint(eager=True))
        te = t(lambda: df.groupBy("g").agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95")).collect())
        ts = t(lambda: sampled_quantiles(
            df, ["g"], "value", [0.5, 0.95], rate=0.0625,
            key_col="event_id").collect())
        print(f"n={n:>10,}  exact={te:6.2f}s  sampled(1/16)={ts:6.2f}s  "
              f"speedup={te/ts:4.1f}x")
        df.unpersist()


def bucketed_join(spark):
    from logport_spark.operators.bucketed import write_bucketed

    print("== bucketed vs plain url-keyed join, 1M rows/side ==")
    pages = spark.read.parquet("/root/repo/data/pages_sf1").select("url")
    a = pages.select("url", F.length("url").alias("m1"))
    b = pages.select("url", F.crc32(F.col("url").cast("binary")).alias("m2"))
    a.write.mode("overwrite").parquet("/tmp/s12/plain_a")
    b.write.mode("overwrite").parquet("/tmp/s12/plain_b")
    write_bucketed(a, "s12_bq_a", "/tmp/s12/bq_a", "url", 32)
    write_bucketed(b, "s12_bq_b", "/tmp/s12/bq_b", "url", 32)

    def plain():
        (spark.read.parquet("/tmp/s12/plain_a").hint("merge")
         .join(spark.read.parquet("/tmp/s12/plain_b"), "url")
         .agg(F.sum(F.col("m1") * F.col("m2"))).collect())

    def bq():
        (spark.table("s12_bq_a").hint("merge")
         .join(spark.table("s12_bq_b"), "url")
         .agg(F.sum(F.col("m1") * F.col("m2"))).collect())

    tp, tb = t(plain), t(bq)
    print(f"plain(SMJ, 2 shuffles)={tp:5.2f}s  bucketed(0 shuffles)={tb:5.2f}s"
          f"  speedup={tp/tb:4.1f}x")


if __name__ == "__main__":
    spark = get_spark("s12_measure")
    quantile_ladder(spark)
    bucketed_join(spark)
    spark.stop()
