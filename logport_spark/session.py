"""SparkSession factory tuned for the pipeline.

Local-mode testing stands in for a multi-executor cluster; every knob here is
chosen to survive a 1000-executor / 100 TB deployment:

- AQE on (runtime partition coalescing + skew-join splitting),
- Arrow on (the parse hot path is pandas-UDF-vectorized, never per-row),
- shuffle partitions sized to cores locally (on a real cluster this is
  overridden to ~2-3x total cores; AQE coalesces the tail),
- UTC session timezone (deterministic `@timestamp` derivation from warc_ts),
- dynamic partition overwrite (idempotent per-bucket sink rewrites — the
  exactly-once half of the ledger protocol, see plans/ledger.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "logport_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_min_parallelism(df, min_parts: int | None = None):
    """Small-file guard for CPU-heavy operators (dedup/minhash/fingerprint).

    A scan of one small parquet file yields ONE input partition, serializing
    every narrow map stage behind it onto a single core. Repartition up to
    the session's default parallelism only when the scan is under-partitioned
    — with production inputs (many files / 100 TB) the condition is false and
    no extra shuffle enters the plan.

    Deliberately NOT input-size-capped, unlike the streaming twin
    (streaming/dedup_stream.ensure_parallelism): this guard wraps one-shot
    scans whose per-byte compute is enormous (the 580 KB sf0.1 documents
    table feeds seconds of shingling/minhash on 32 cores), so bytes are
    the wrong proxy for work — widening to the cores is correct. The
    streaming widen runs once per micro-batch forever and over-widening
    there mints near-empty tasks on every trigger, hence its cap."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
