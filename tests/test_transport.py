"""Mock transport: deliver → nack → replay end-to-end (K1/K3/R4 loop).

The delivery layer as code, not prose: wire batches are produced to a
local-directory broker with per-batch delivery reports; injected failures
come back as nacks; replaying the nacked set completes delivery exactly
once (content-addressed batch files make redelivery idempotent).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logport_spark.operators import transport as T
from logport_spark.operators.wire import batch_messages


@pytest.fixture(scope="module")
def wire(spark, pages_small):
    from logport_spark.plans.ledger import with_bucket
    from logport_spark.plans.pipeline import parsed_routed

    routed = parsed_routed(spark, pages_small)
    rec = with_bucket(routed.select("sink", "url", "line_no", "record"))
    return batch_messages(rec, stream_col="bucket").cache()


def test_flush_deadline_must_exceed_message_timeout(spark, wire, tmp_path):
    with pytest.raises(ValueError, match="flush deadline"):
        T.deliver(wire, str(tmp_path), message_timeout_ms=10_000,
                  flush_deadline_ms=10_000)


def test_deliver_nack_replay_exactly_once(spark, wire, tmp_path):
    broker = str(tmp_path / "broker")
    sinks = [r.sink for r in wire.select("sink").distinct().collect()]
    down = sinks[0]  # simulate one broker down on the first attempt

    attempt1 = T.deliver(
        wire.withColumn("boom", F.col("sink") == down), broker, fail_col="boom"
    ).cache()
    n_total = wire.count()
    by_status = {r["status"]: r["n"] for r in
                 attempt1.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert by_status.get("nack", 0) > 0
    # flush accounting: every batch is acked or nacked, none lost
    assert by_status.get("ack", 0) + by_status.get("nack", 0) == n_total
    assert attempt1.filter(
        (F.col("status") == "nack") & (F.col("error") != "message.timeout")
    ).count() == 0

    # undelivered-log replay: only the nacked set re-enters the producer
    retry = T.replay_nacked(attempt1, wire)
    assert retry.count() == by_status["nack"]
    assert {r.sink for r in retry.select("sink").distinct().collect()} == {down}
    attempt2 = T.deliver(retry, broker)
    assert attempt2.filter(F.col("status") != "ack").count() == 0

    # the broker now holds every wire batch exactly once, byte-identical
    got = T.broker_contents(spark, broker)
    assert got.count() == n_total
    want = wire.select("sink", T.batch_key().alias("batch_key"), "body")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_deliver_empty_wire(spark, wire, tmp_path):
    """Zero batches to produce (fully-drained replay set) must yield an
    empty report table with the right schema, not a crash."""
    empty = wire.filter(F.lit(False))
    rep = T.deliver(empty, str(tmp_path / "b0"))
    assert rep.count() == 0
    assert rep.columns == ["sink", "batch_key", "n_msgs", "bytes", "status", "error"]


def test_stream_deliver_equals_batch_wire(spark, pages_small, wire, tmp_path):
    """Continuous mode end-to-end: streaming micro-batches produce to the
    broker. Every report acks, the broker holds exactly the reported batch
    set once, delivered message totals equal the batch pipeline's routed
    row count, and a restart over the same checkpoint adds nothing."""
    from logport_spark.streaming.stream import run_stream_deliver

    pages_dir = str(tmp_path / "pages")
    pages_small.repartition(4).write.parquet(pages_dir)
    broker = str(tmp_path / "broker_s")
    out = str(tmp_path / "out_s")
    ckpt = str(tmp_path / "ckpt_s")

    run_stream_deliver(spark, pages_dir, broker, out, ckpt, max_files=2)
    reports = spark.read.parquet(out + "/delivery_reports")
    assert reports.filter(F.col("status") != "ack").count() == 0
    # every delivered batch is on the broker exactly once, none missing
    got = T.broker_contents(spark, broker).select("batch_key")
    want = reports.select("batch_key").distinct()
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # total routed rows delivered == the batch pipeline's row count
    from logport_spark.plans.pipeline import parsed_routed

    n_rows = parsed_routed(spark, spark.read.parquet(pages_dir)).count()
    assert reports.agg(F.sum("n_msgs")).collect()[0][0] == n_rows
    # restart: no new reports, no new broker files
    n_files = got.count()
    run_stream_deliver(spark, pages_dir, broker, out, ckpt, max_files=2)
    assert T.broker_contents(spark, broker).count() == n_files


def test_redelivery_is_idempotent(spark, wire, tmp_path):
    """Producing the same batches twice (the at-least-once crash case) leaves
    the broker with one file per batch — the content address dedups."""
    broker = str(tmp_path / "broker2")
    T.deliver(wire, broker).count()
    T.deliver(wire, broker).count()
    assert T.broker_contents(spark, broker).count() == wire.count()
