"""Routing: broadcast route resolution, salted repartition, fan-out write.

- R1 route resolution (file→topic, src/LogPort.cc:639-643 +
  src/Database.cc:65-77): broadcast join on route_key → sink + envelope
  constants (hostname/prd/log_type).
- R2 partitioning (src/KafkaProducer.cc:389-397 uses rdkafka's keyless
  round-robin): here records land in per-sink table partitions; a hot domain
  would funnel one partition through one task, so we SALT the repartition —
  `repartition(sink, pmod(xxhash64(url), salt_buckets))` spreads each sink's
  write across `salt_buckets` tasks while keeping files grouped per sink.
- R3 multi-target fan-out (src/HttpProducer.cc:196-224): one physical write
  partitioned BY sink — each sink table is a partition directory; a true
  multi-table fan-out is a loop of filtered writes sharing the same cached
  upstream (used by the streaming variant).
- K2 dead-letter (src/KafkaProducer.cc:83-126): parse failures are routed to
  the quarantine table alongside the sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def resolve_route(df: DataFrame, routes: DataFrame) -> DataFrame:
    """R1: attach sink + envelope constants via broadcast hash join."""
    r = routes.select(
        "route_key",
        "sink",
        F.col("hostname").alias("route_hostname"),
        F.col("product_code").alias("route_prd"),
        F.col("log_type").alias("route_log_type"),
    )
    return df.join(F.broadcast(r), "route_key", "left")


def salt_col(url_col: str = "url", buckets: int = 16):
    """Deterministic salt from the url — defuses hot-domain skew."""
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(buckets)).cast("int")


def salted_repartition(df: DataFrame, buckets: int = 16, parallelism: int | None = None) -> DataFrame:
    df = df.withColumn("salt", salt_col(buckets=buckets))
    n = parallelism or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return df.repartition(int(n), F.col("sink"), F.col("salt"))


ROUTED_COLS = [
    "url",
    "line_no",
    "record",
    "domain",
    "tld",
    "category",
    "locale",
    "lang",
    "warc_ts",
    "record_bytes",
    "is_obj",
    "parse_fail",
    "sink",
]


def write_routed(df: DataFrame, out_dir: str, salt_buckets: int = 16, extra_partition_cols: list[str] | None = None) -> None:
    """Fan-out write: one atomic job, per-sink partition directories."""
    part_cols = (extra_partition_cols or []) + ["sink"]
    cols = [c for c in ROUTED_COLS if c not in part_cols] + part_cols
    salted = salted_repartition(df, buckets=salt_buckets)
    salted.select(*[c for c in cols if c in salted.columns], *(
        [] if "salt" in cols else []
    )).drop("salt").write.mode("overwrite").partitionBy(*part_cols).parquet(out_dir)


def quarantine(df: DataFrame) -> DataFrame:
    """Dead-letter channel: lines that hit the parse-failure branch.

    Keeps (url, warc_ts, lang) so the rows can re-enter the parse path on
    replay (ledger.replay_quarantine), mirroring the reference's undelivered
    file whose lines are re-produced through the same envelope path."""
    return df.filter(F.col("parse_fail")).select(
        "url", "warc_ts", "lang", "line_no",
        F.col("line").alias("raw"),
        F.lit("json_parse_failure").alias("reason"),
    )


def compact_sinks(spark, out_dir: str,
                  target_file_bytes: int = 128 << 20) -> dict[str, tuple[int, int]]:
    """OPTIMIZE-style small-file compaction for the routed sink table —
    the maintenance job a 10^12-row fan-out needs: salted writes
    deliberately spread each sink across `salt_buckets` tasks (skew
    defense), so a long-running pipeline accretes small files per sink
    until scans go metadata-bound. Per sink partition: if the file count
    exceeds ceil(bytes / target_file_bytes), rewrite JUST that partition
    at the target count via dynamic partition overwrite (the same
    atomic, exactly-once-preserving primitive the ledger and streaming
    state rely on — readers see the old or the new file set, never a
    mix, and row content is untouched; pytest pins count + value-hash
    equality across compaction).

    Handles any key=val partition tree — the run layout (sink=) and the
    ledger layout (bucket=/sink=) alike. The per-leaf loop is
    driver-side but bounded by the partition count (sinks are logport's
    topics — tens; ledger buckets are the resume granularity — tens),
    and the directory listing is the local-parquet stand-in for what
    Iceberg's rewrite_data_files metadata scan does (plans/iceberg.py
    gates the real thing). Returns {partition_path: (files_before,
    files_after)} for the leaves rewritten."""
    import os

    leaves: list[tuple[str, list[tuple[str, str]]]] = []

    def walk(d: str, spec: list[tuple[str, str]]) -> None:
        parts = [e for e in sorted(os.listdir(d))
                 if "=" in e and os.path.isdir(os.path.join(d, e))]
        if not parts:
            if spec:
                leaves.append((d, spec))
            return
        for e in parts:
            k, v = e.split("=", 1)
            walk(os.path.join(d, e), spec + [(k, v)])

    walk(out_dir, [])
    done: dict[str, tuple[int, int]] = {}
    for d, spec in leaves:
        files = [os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".parquet")]
        if not files:
            continue
        nbytes = sum(os.path.getsize(f) for f in files)
        target = max(1, -(-nbytes // target_file_bytes))
        if len(files) <= target:
            continue
        part = spark.read.parquet(d).repartition(target)
        for k, v in spec:
            part = part.withColumn(k, F.lit(v))
        (part.write.mode("overwrite")
         .partitionBy(*[k for k, _ in spec]).parquet(out_dir))
        done["/".join(f"{k}={v}" for k, v in spec)] = (len(files), target)
    return done
