"""End-to-end parse→enrich→route vs the pure-Python oracle.

Gates (BASELINE.json input_hint / north_rule):
- byte-identical extracted record per (url, line_no)
- per-sink aggregate counts equal to the oracle
- empty lines dropped; parse-failure branch counted
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logport_spark.plans.pipeline import parsed_routed, sink_metrics


def _spark_records(spark, pages_small):
    routed = parsed_routed(spark, pages_small)
    return routed


def test_byte_identical_records(spark, pages_small, oracle_small):
    routed = _spark_records(spark, pages_small)
    got = {
        (r["url"], r["line_no"]): r["record"]
        for r in routed.select("url", "line_no", "record").collect()
    }
    want = {(r["url"], r["line_no"]): r["record"] for r in oracle_small["records"]}
    assert len(got) == len(want)
    mismatches = [(k, got[k], want[k]) for k in want if got.get(k) != want[k]]
    assert not mismatches, f"first mismatch: {mismatches[0]}"


def test_routing_and_enrichment(spark, pages_small, oracle_small):
    routed = _spark_records(spark, pages_small)
    got = {
        (r["url"], r["line_no"]): (r["sink"], r["domain"], r["tld"], r["category"], r["locale"])
        for r in routed.select("url", "line_no", "sink", "domain", "tld", "category", "locale").collect()
    }
    for r in oracle_small["records"]:
        k = (r["url"], r["line_no"])
        assert got[k] == (r["sink"], r["domain"], r["tld"], r["category"], r["locale"]), k


def test_per_sink_metrics(spark, pages_small, oracle_small):
    routed = _spark_records(spark, pages_small)
    got = {
        r["sink"]: (r["rows_routed"], r["bytes_shipped"], r["parse_failures"])
        for r in sink_metrics(routed).collect()
    }
    want = {
        s: (m["rows_routed"], m["bytes_shipped"], m["parse_failures"])
        for s, m in oracle_small["metrics"].items()
    }
    assert got == want


def test_empty_lines_dropped(spark, pages_small):
    routed = _spark_records(spark, pages_small)
    assert routed.filter(F.length("line") == 0).count() == 0


def test_scrub_hook(spark, pages_small):
    from logport_spark.operators.parse import SCRUB_TOMBSTONE
    from logport_spark.plans.pipeline import parsed_routed

    routed = parsed_routed(spark, pages_small, scrub_enabled=True)
    bad = routed.filter(
        F.col("line").contains('"card_number":"') & ~F.col("line").contains("XXX")
    )
    assert bad.count() == 0
    assert routed.filter(F.col("line") == SCRUB_TOMBSTONE).count() > 0


def test_html_never_read(spark, pages_small):
    """Column pruning: the binary html column must not reach the scan."""
    routed = _spark_records(spark, pages_small)
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "html" not in plan


def test_jvm_json_quote_matches_python(spark):
    """jvm_json_quote (Jackson slice + lowercase normalization) must be
    byte-identical to json.dumps(..., ensure_ascii=False) on the full
    control-char range, specials, and non-ASCII."""
    import json

    from logport_spark.operators.parse import jvm_json_quote

    cases = ([chr(i) for i in range(0x20)]
             + ['"', "\\", "", " ", "plain", 'mix "q" \\ \x07 end',
                "tab\there", "uni ü 你好 🙂", "é\x1f", "\\u0041 literal",
                '{"not":"parsed"}', "a\x00b\x1fc"])
    df = spark.createDataFrame([(c,) for c in cases], "x string")
    from pyspark.sql import functions as F

    got = df.select("x", jvm_json_quote(F.col("x")).alias("q")).collect()
    for r in got:
        assert r["q"] == json.dumps(r["x"], ensure_ascii=False), repr(r["x"])


def test_warc_export_round_trip(spark, pages_small):
    """The emitted record is well-formed WARC/1.0: version line, CRLF
    headers, Content-Length equals the payload octets, the payload slice
    byte-equals the source html, two-CRLF trailer; record ids are
    deterministic (rerun-identical) and the plan is a narrow map."""
    from pyspark.sql import functions as F

    from logport_spark.operators.parse import warc_export

    out = warc_export(pages_small, include_record=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

    rows = out.limit(20).collect()
    src = {r["url"]: bytes(r["html"]) for r in
           pages_small.select("url", "html").limit(1000).collect()}
    for r in rows:
        rec = bytes(r["record"])
        assert rec.startswith(b"WARC/1.0\r\n")
        head, _, rest = rec.partition(b"\r\n\r\n")
        headers = dict(
            line.split(": ", 1)
            for line in head.decode("ascii").split("\r\n")[1:])
        assert headers["WARC-Type"] == "response"
        assert headers["WARC-Target-URI"] == r["url"]
        assert headers["WARC-Record-ID"] == f'<{r["record_id"]}>'
        n = int(headers["Content-Length"])
        assert n == r["content_length"] == len(src[r["url"]])
        assert rest[:n] == src[r["url"]]
        assert rest[n:] == b"\r\n\r\n"
        assert len(rec) == r["record_len"]

    again = {r["url"]: r["record_id"]
             for r in warc_export(pages_small).limit(20).collect()}
    assert all(again[r["url"]] == r["record_id"] for r in rows)
