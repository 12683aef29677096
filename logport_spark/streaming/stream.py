"""Structured Streaming variant of the pipeline (SURVEY.md §7 P6).

The batch DAG is reused VERBATIM inside foreachBatch — the streaming layer
only adds incremental file discovery (logport's inotify analog,
src/InotifyWatcher.cc:252-510), checkpointed progress (the offset ledger
analog, src/Watch.cc:180-200), and watermarked event-time windows for the
telemetry cadences (src/Inspector.cc:36-55).

Design notes for scale:
- `maxFilesPerTrigger` bounds micro-batch size = the reference's bounded
  in-flight queue / backpressure (src/KafkaProducer.cc:385-423).
- foreachBatch + per-(batch_id, sink) dynamic-overwrite writes = the
  multi-target fan-out (src/HttpProducer.cc:196-224); a micro-batch
  replayed after a crash overwrites its own batch_id partitions, and the
  checkpoint commits after — idempotent replay, exactly-once into the sink
  tables (same write discipline as plans/ledger.py).
- Watermark on warc_ts bounds state for late pages; window aggregates emit
  per (window, sink) — the streaming twin of sink_metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import parsed_routed

SINK_COLS = ["url", "line_no", "record", "record_bytes", "parse_fail", "sink"]


def pages_stream(spark: SparkSession, pages_dir: str, max_files: int = 2) -> DataFrame:
    """Incremental scan: new parquet files under pages_dir become micro-batches
    (the inotify IN_MODIFY analog).

    Rotation (the IN_MOVE_SELF drain + reset, src/InotifyWatcher.cc:454-478):
    a rotated file is a RENAME out of the live set. pathGlobFilter pins the
    live set to '*.parquet', so a file renamed to 'part-0.parquet.1' leaves
    the glob instead of reappearing as a new path (which would double-read
    its rows — FileStreamSource tracks seen files by path, not content); the
    replacement file at a fresh path is discovered normally."""
    schema = spark.read.option("pathGlobFilter", "*.parquet").parquet(pages_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "*.parquet")
        .parquet(pages_dir)
    )


def run_stream_pipeline(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files: int = 2,
) -> None:
    """Run the full parse→enrich→route DAG incrementally until no new files
    remain (availableNow), writing per-(batch, sink) partitions.

    Exactly-once into the sink tables: each micro-batch writes under its own
    batch_id partition with DYNAMIC partition overwrite (the same idempotent
    write as plans/ledger._write_sinks), so a batch replayed after a crash
    between the write and the checkpoint commit overwrites its own
    partitions instead of appending duplicates."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        routed = parsed_routed(batch_df.sparkSession, batch_df)
        (
            routed.select(*SINK_COLS)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "sink")
            .parquet(out_dir + "/sinks")
        )

    q = (
        pages_stream(spark, pages_dir, max_files)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_deliver(
    spark: SparkSession,
    pages_dir: str,
    broker_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files: int = 2,
) -> None:
    """The reference's continuous operating mode end-to-end: tail → parse →
    route → wire-batch → PRODUCE, per micro-batch (logport's inotify loop
    feeding its producers, src/LogPort.cc watch loop + src/KafkaProducer.cc
    produce/flush).

    Each micro-batch forms wire batches (per-(sink, crc32-bucket)
    sub-streams) and delivers them through operators/transport.deliver —
    the flush barrier runs INSIDE the batch, and the delivery-report table
    is written under the batch_id partition with dynamic overwrite before
    the checkpoint commits, so a replayed batch re-produces idempotently
    (content-addressed payload files) and overwrites its own report rows:
    exactly-once reports over an at-least-once produce loop."""
    from ..operators.transport import deliver
    from ..operators.wire import batch_messages
    from ..plans.ledger import with_bucket

    def process(batch_df: DataFrame, batch_id: int) -> None:
        routed = parsed_routed(batch_df.sparkSession, batch_df)
        # DEFAULT_BUCKETS is safe here: micro-batch size is bounded by the
        # trigger (maxFilesPerTrigger), not by the corpus — the scaled_buckets
        # rule applies to the unbounded batch paths, not a bounded trigger.
        wire = batch_messages(
            with_bucket(routed.select("sink", "url", "line_no", "record")),
            stream_col="bucket",
        )
        reports = deliver(wire, broker_dir)
        (
            reports.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir + "/delivery_reports")
        )

    q = (
        pages_stream(spark, pages_dir, max_files)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_sink_counts(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_sink_counts",
    watermark: str = "1 hour",
    window: str = "1 day",
    max_files: int = 2,
):
    """Watermarked tumbling-window rows-routed per sink, into a memory sink.

    The event-time twin of sink_metrics: late pages beyond the watermark are
    dropped from state; windows emit as (window_start, window_end, sink, n)."""
    from ..operators import enrich as E
    from ..operators import parse as P
    from ..operators import route as R

    src = pages_stream(spark, pages_dir, max_files)
    lines = P.explode_lines(src)
    lookups = E.load_lookups(spark)
    routed = R.resolve_route(E.enrich(E.with_domain(lines), lookups), lookups["routes"])
    agg = (
        routed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "sink")
        .agg(F.count(F.lit(1)).alias("rows_routed"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sink",
            "rows_routed",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def dedup_stream(events: DataFrame, key: str = "event_id",
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop redelivered rows by key within the
    watermark horizon.

    logport is at-least-once — a nacked batch is re-produced whole
    (src/KafkaProducer.cc:83-126 undelivered-log replay), so consumers see
    duplicates. This is the engine-side dedup for that stream:
    dropDuplicatesWithinWatermark keeps state only for `watermark` of event
    time (state is O(keys-per-horizon), not O(stream)), which is the only
    formulation that survives an unbounded 100 TB/day stream."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def windowed_hll_distinct(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_hll",
    watermark: str = "1 hour",
    window: str = "1 day",
    max_files: int = 2,
):
    """Streaming distinct-URL estimation with HLL registers AS the state.

    Exact streaming COUNT(DISTINCT) must hold every key in the state store
    — O(distinct keys per horizon), unbounded on a web-scale stream. Here
    the streaming aggregate is groupBy(window, domain, register) -> max(rho)
    (operators/sketches.py), so state is bounded at windows x domains x 256
    rows NO MATTER the stream: the keys themselves never enter state. The
    emitted register table is the same mergeable artifact the batch sketch
    persists (hll_merge/hll_estimate consume it unchanged), so a streaming
    day and a batch backfill combine exactly.

    Returns (register table, max state rows observed) — the bound is part
    of the contract and pytest-pinned.
    """
    from ..operators import enrich as E
    from ..operators.sketches import hll_register, hll_rho

    src = pages_stream(spark, pages_dir, max_files)
    regs = (
        E.with_domain(src)
        .select(
            "warc_ts",
            "domain",
            hll_register(F.col("url")).alias("register"),
            hll_rho(F.col("url")).alias("rho"),
        )
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "domain", "register")
        .agg(F.max("rho").alias("m_j"))
        .select(
            F.col("w.start").alias("window_start"),
            "domain",
            "register",
            "m_j",
        )
    )
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = max(
        (so.get("numRowsTotal", 0)
         for p in q.recentProgress
         for so in p.get("stateOperators", [])),
        default=0,
    )
    return spark.table(query_name), state_rows


# ------------------------------------------------ Kafka sink (gated) -------


def kafka_sink_available(spark: SparkSession) -> bool:
    """Capability probe: the Kafka DSv2 provider (spark-sql-kafka-0-10) is a
    separate artifact, absent in this container. On a real cluster
    (--packages org.apache.spark:spark-sql-kafka-0-10_2.13) this returns
    True and the real sink runs with no code edits — the same gate pattern
    as multimodal.decode_media / textstats.lang_id_model."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def to_kafka_rows(routed: DataFrame) -> DataFrame:
    """Shape routed records for the Kafka sink: topic = sink (logport routes
    one watched file to one topic, src/LogPort.cc watch table), key = url
    (per-page ordering within a partition, the per-watch FIFO analog),
    value = the envelope JSON. Pure projection — unit-testable without a
    broker, shared by the real sink below and any foreachBatch producer."""
    return routed.select(
        F.col("sink").alias("topic"),
        F.col("url").cast("binary").alias("key"),
        F.col("record").cast("binary").alias("value"),
    )


def run_stream_kafka(
    spark: SparkSession,
    pages_dir: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    max_files: int = 2,
):
    """Continuous tail → parse → route → Kafka produce: the reference's
    primary mode (src/KafkaProducer.cc:276-435) as a Structured Streaming
    sink. Delivery semantics mirror the reference's producer config:
    acks=all + idempotent producer (src/KafkaProducer.cc:83-126 sets
    delivery.report + retries), over the sink's at-least-once checkpointing
    — duplicates on replay carry identical (key, value), the same contract
    the mock transport enforces content-addressably. Gated: raises here
    (no broker/package in the container); `tests/test_streaming.py` pins the
    row shaping and the gate."""
    if not kafka_sink_available(spark):
        raise NotImplementedError(
            "Kafka sink requires the spark-sql-kafka-0-10 package and a "
            "broker — not available in this container; the mock transport "
            "(operators/transport.py) covers produce/flush/delivery-report "
            "semantics, and run_stream_deliver runs the same loop end-to-end"
        )
    out = to_kafka_rows(parsed_routed(spark, pages_stream(spark, pages_dir, max_files)))
    return (  # pragma: no cover — requires a broker
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.acks", "all")
        .option("kafka.enable.idempotence", "true")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
