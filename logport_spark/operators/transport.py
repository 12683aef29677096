"""Mock transport sender: the delivery layer (K1/K3/R4) as running code.

The reference's producers deliver wire batches to brokers and surface
per-message delivery reports; the engine analogs here are:

- produce/poll loop (src/KafkaProducer.cc:276-435): `deliver()` runs the
  wire-batch DataFrame through mapInPandas; each Arrow batch is one produce
  window — every batch in the window is either ACKED (written to the broker
  directory) or NACKED (simulated delivery failure after message.timeout)
  before the window yields. Local directories stand in for brokers; on a
  real cluster the file write becomes the socket send and nothing else
  changes.
- flush/commit coupling (src/KafkaProducer.cc:157-165,248): the reference
  requires message.timeout < the flush deadline so flush() can account for
  every message before the offset commit. `deliver()` enforces the same
  invariant up front, and the mapInPandas window IS the flush barrier:
  report rows leave the window only after every payload file is closed, and
  Spark's task commit (the offset-save analog) happens after the task —
  i.e. after the flush — completes.
- delivery-report → dead-letter (src/KafkaProducer.cc:83-126): NACKED
  batches come back as report rows; `replay_nacked()` joins them to the
  wire table so the next run re-produces exactly the undelivered set.
- backpressure (R4, src/KafkaProducer.cc:385-423 bounded in-flight queue):
  in-flight messages are bounded by the Arrow batch size
  (spark.sql.execution.arrow.maxRecordsPerBatch, session-tuned), the
  streaming twin is maxFilesPerTrigger (streaming/stream.py).

Idempotence: payload files are content-addressed (sha1 of sink|body), so a
replayed or duplicated produce of the same batch overwrites the same file —
redelivery is exactly-once at the broker directory, matching the ledger's
dynamic-overwrite discipline.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPORT_DDL = (
    "sink string, batch_key string, n_msgs int, bytes long, "
    "status string, error string"
)

DEFAULT_MESSAGE_TIMEOUT_MS = 5_000   # rd_kafka message.timeout.ms analog
DEFAULT_FLUSH_DEADLINE_MS = 10_000   # flush() deadline analog


def batch_key(sink_col: str = "sink", body_col: str = "body"):
    """Content address of a wire batch (JVM sha1) — the idempotence key."""
    return F.sha1(F.concat_ws("|", F.col(sink_col), F.col(body_col)))


def deliver(
    wire: DataFrame,
    broker_dir: str,
    message_timeout_ms: int = DEFAULT_MESSAGE_TIMEOUT_MS,
    flush_deadline_ms: int = DEFAULT_FLUSH_DEADLINE_MS,
    fail_col: str | None = None,
) -> DataFrame:
    """Deliver wire batches (sink, body, n_msgs ...) to the mock broker.

    Returns one delivery report per batch: status 'ack' | 'nack'. `fail_col`
    names an optional boolean column — rows where it is true simulate a
    delivery failure (the message.timeout expiring), which is how tests
    inject broker outages. Raises if the flush deadline does not exceed the
    message timeout (the reference mis-config that loses delivery reports).
    """
    if flush_deadline_ms <= message_timeout_ms:
        raise ValueError(
            f"flush deadline ({flush_deadline_ms} ms) must exceed "
            f"message.timeout ({message_timeout_ms} ms): flush() could return "
            "before every in-flight message is acked or timed out "
            "(src/KafkaProducer.cc:157-165)"
        )
    cols = wire.select(
        "sink", "body", F.col("n_msgs").cast("int").alias("n_msgs"),
        batch_key().alias("batch_key"),
        (F.col(fail_col).cast("boolean") if fail_col else F.lit(False)).alias("_fail"),
    )

    def produce(windows: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in windows:  # one Arrow batch == one produce window
            reports = []
            for sink, body, n_msgs, key, fail in zip(
                pdf["sink"], pdf["body"], pdf["n_msgs"], pdf["batch_key"], pdf["_fail"]
            ):
                if bool(fail):
                    reports.append((sink, key, int(n_msgs), len(body.encode()),
                                    "nack", "message.timeout"))
                    continue
                d = os.path.join(broker_dir, sink)
                os.makedirs(d, exist_ok=True)
                tmp = os.path.join(d, f".{key}.{os.getpid()}.tmp")
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(body)
                os.replace(tmp, os.path.join(d, f"{key}.json"))  # atomic publish
                reports.append((sink, key, int(n_msgs), len(body.encode()),
                                "ack", None))
            # flush barrier: every batch of this window is accounted above
            # before a single report row leaves the window
            yield pd.DataFrame(reports, columns=[
                "sink", "batch_key", "n_msgs", "bytes", "status", "error"])

    return cols.mapInPandas(produce, REPORT_DDL)


def replay_nacked(reports: DataFrame, wire: DataFrame) -> DataFrame:
    """Undelivered-log replay: the wire batches whose delivery report says
    'nack', ready to re-enter deliver() on the next run."""
    nacked = reports.filter(F.col("status") == "nack").select("batch_key")
    return (
        wire.withColumn("batch_key", batch_key())
        .join(F.broadcast(nacked), "batch_key")
        .drop("batch_key")
    )


def broker_contents(spark, broker_dir: str) -> DataFrame:
    """Read back what the mock broker holds: (sink, batch_key, body)."""
    rows = []
    for sink in sorted(os.listdir(broker_dir)):
        d = os.path.join(broker_dir, sink)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn), encoding="utf-8") as f:
                    rows.append((sink, fn[:-5], f.read()))
    return spark.createDataFrame(rows, "sink string, batch_key string, body string")
