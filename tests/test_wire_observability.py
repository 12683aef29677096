"""Observer METTL dialect (byte-exact), HTTP wire formats, grok stage."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from logport_spark.observability import (
    MettlWriter, escape_to_json_string, observer_entry,
)


def test_observer_escaper_seven_cases():
    """src/Common.cc:227-250: exactly \\ \\b \\f \\n \\r \\t \" — control
    bytes outside that set pass through RAW (unlike json.dumps)."""
    assert escape_to_json_string('a"b\\c') == 'a\\"b\\\\c'
    assert escape_to_json_string("t\tn\nr\rb\bf\f") == "t\\tn\\nr\\rb\\bf\\f"
    assert escape_to_json_string("bell\x07") == "bell\x07"  # NOT \\u0007


def test_observer_entry_dialect():
    """Unquoted sec.9ns literal; {-prefixed payload embedded WITHOUT
    validation (src/Observer.cc:128-149)."""
    e = observer_entry("hello world", ts_str="1556311722.644052770")
    assert e == '{"generated_at":1556311722.644052770,"log":"hello world"}'
    # raw-embed quirk: invalid JSON object payload goes in unvalidated
    e2 = observer_entry("{broken", ts_str="1.000000000")
    assert e2 == '{"generated_at":1.000000000,"log":{broken}'
    # and the Kafka-dialect differences: quoted ts, sorted keys (SURVEY §1.4)
    from logport_spark.oracle import build_envelope

    kafka, _, _ = build_envelope("hello world", "1.000000000", "", "", "", "")
    assert kafka == '{"@timestamp":"1.000000000","log":"hello world"}'


def test_observer_line_col_equals_python(spark):
    """The JVM Observer-dialect builder must be byte-identical to the
    pure-Python observer_entry on a hostile corpus (escape storms, control
    bytes, raw-embedded junk JSON, literal backslash-escape lookalikes)."""
    from pyspark.sql import functions as F

    from logport_spark.observability import observer_line_col

    cases = [
        'a"b\\c', "t\tn\nr\rb\bf\f", "bell\x07", "{broken", '{"k":1}',
        "\\u001A", "\\\\", "plain words", "{", '"', "\x1a\x1b", "mixed\\\t\"x",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    out = df.select(
        "s", observer_line_col(F.col("s"), F.lit("1.000000000")).alias("e")
    ).collect()
    for r in out:
        assert r.e == observer_entry(r.s, ts_str="1.000000000"), r.s


def test_mettl_writer(tmp_path):
    w = MettlWriter(str(tmp_path))
    w.add_metric("rows_routed", 42, "r1", ts=2.0)
    w.add_event("rotation detected", ts=2.0)
    w.add_log("starting watch", ts=2.0)
    m = (tmp_path / "metrics").read_text().strip()
    assert m == ('{"generated_at":2.000000000,"log":'
                 '{"metric":"rows_routed","value":42,"run_id":"r1"}}')
    assert json.loads(m)["log"]["value"] == 42


def test_emit_run_metrics(spark, pages_small, tmp_path):
    from logport_spark.observability import emit_run_metrics
    from logport_spark.plans import ledger as L

    out = str(tmp_path / "out")
    L.run_with_ledger(spark, pages_small, out, run_id="m1", n_buckets=8)
    mdf = emit_run_metrics(spark, out, "m1", mettl_dir=str(tmp_path / "mettl"))
    vals = {r.metric: r.value for r in mdf.collect()}
    assert vals["buckets_committed"] == 8
    assert vals["rows_routed"] > 0
    assert (tmp_path / "mettl" / "metrics").exists()
    # queryable back from parquet
    back = spark.read.parquet(out + "/_metrics")
    assert back.count() == 4


def test_wire_formats(spark):
    from logport_spark.operators.wire import batch_messages, clamp_batch_size

    assert clamp_batch_size(0) == 1
    assert clamp_batch_size(10**9) == 100_000
    df = spark.createDataFrame(
        [("s1", "u1", 1, '{"a":1}'), ("s1", "u1", 2, '{"b":2}'), ("s1", "u2", 1, '{"c":3}')],
        "sink string, url string, line_no int, record string",
    )
    js = batch_messages(df, "JSON", batch_size=2).orderBy("batch_id").collect()
    assert js[0]["body"] == '{"messages":[{"a":1},{"b":2}],"count":2}'
    assert js[1]["body"] == '{"messages":[{"c":3}],"count":1}'
    kv = batch_messages(df, "KAFKA_JSON_V2_JSON", batch_size=10).collect()
    assert kv[0]["body"] == (
        '{"records":[{"value":{"a":1}},{"value":{"b":2}},{"value":{"c":3}}]}'
    )


def test_conn_templates_auth(spark):
    import base64

    from logport_spark.operators.enrich import load_lookups
    from logport_spark.operators.wire import connection_templates

    rows = {r.sink: r for r in connection_templates(load_lookups(spark)["routes"]).collect()}
    assert rows["sink_forum"].auth_header == (
        "Basic " + base64.b64encode(b"svc:s3cret").decode()
    )
    assert rows["sink_forum"].producer_type == "HTTP"
    assert rows["sink_news"].producer_type == "KAFKA"
    assert rows["sink_news"].auth_header is None
    # port resolution: explicit :port wins; scheme default otherwise
    assert rows["sink_forum"].port == 8080     # explicit in the URL
    assert rows["sink_news"].port == 9092      # explicit kafka port
    from logport_spark.operators.wire import resolved_port

    from pyspark.sql import functions as F

    dflt = {r.u: r.p for r in spark.createDataFrame(
        [("kafka://broker/x",), ("https://c/logs",), ("http://c/logs",),
         ("redis://r",)], "u string").select(
        "u", resolved_port(F.col("u")).alias("p")).collect()}
    assert dflt == {"kafka://broker/x": 9092, "https://c/logs": 443,
                    "http://c/logs": 80, "redis://r": 6379}


def test_grok_match_and_fallthrough(spark):
    from logport_spark.operators.grok import grok

    df = spark.createDataFrame(
        [("GET /a/1 200 512 extra", ), ("not an access line", ), ("POST /b 404 9", )],
        "line string",
    )
    rows = grok(df).collect()
    by_line = {r.line: r for r in rows}
    g = by_line["GET /a/1 200 512 extra"]
    assert (g.grok_matched, g.method, g.path, g.status, g.resp_bytes) == (
        True, "GET", "/a/1", 200, 512)
    assert by_line["not an access line"].grok_matched is False
    assert by_line["not an access line"].status is None
    assert by_line["POST /b 404 9"].status == 404
