"""Bucketed (pre-shuffled) tables — the co-located join/agg strategy.

At 100 TB the dominant cost of a repeated equi-join or keyed aggregation is
the Exchange of the fact table: every query re-shuffles the same 10^12 rows
on the same key. Bucketing pays that shuffle ONCE, at write time:
``bucketBy(N, key)`` routes rows to N buckets with the same Murmur3 hash
Spark's HashPartitioning uses, the catalog records the layout, and every
later equi-join between two tables bucketed the same way — and every
``groupBy`` whose keys contain the bucket key — plans with ZERO Exchange.
``sortBy`` additionally pre-sorts within each bucket file so a sort-merge
join can skip its per-task Sort when buckets map 1:1 to files.

This is the storage-layout half of the engine's join story; the runtime
half (broadcast dims, salted repartition for skew, AQE skew-join) lives in
``operators/route.py``. Rule of thumb at scale: bucket the tables you join
or aggregate on the SAME key more than once per written generation (docs
by doc_id through a dedup→score→join cascade, pages by domain through the
host-level passes); broadcast or shuffle the one-off joins.

Local-mode note: Spark's in-session catalog keeps bucket metadata without
any Hive metastore, so the zero-Exchange plans here are exactly what a
warehouse deployment gets; on a cluster the ``saveAsTable`` target is the
shared catalog (see plans/iceberg.py for the Iceberg variant, where the
same role is played by ``PARTITIONED BY (bucket(N, key))``).

Reference parity: logport has no storage tier at all (files in, Kafka
out, /root/reference/src/LogPort.cc) — this module is part of the
engine's superset surface (SURVEY §2.6 join family, storage-layout leg).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _safe_name(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"table name must be a bare identifier: {name!r}")
    return name


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int = 8, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed parquet table registered in the session
    catalog at an explicit ``path`` (external table — the files outlive the
    session; re-registering is one ``saveAsTable`` away).

    ``n_buckets`` is a write-time contract: both sides of a co-located join
    must agree on it (or divide evenly — Spark 3.1+ coalesces k·N to N).
    Size it like shuffle partitions: target bucket files of 100-500 MB at
    the expected table size, and keep it a power of two so a later 2× split
    re-reads cleanly."""
    spark = df.sparkSession
    _safe_name(table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (df.write.mode(mode).format("parquet").option("path", path)
           .bucketBy(n_buckets, key))
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equijoin(spark: SparkSession, left: str, right: str,
                      on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two catalog tables bucketed on the join key — plans with no
    Exchange on either side (pytest-pinned in tests/test_bucketed.py)."""
    return spark.table(_safe_name(left)).join(
        spark.table(_safe_name(right)), on, how)
