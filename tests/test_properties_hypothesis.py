"""Hypothesis property tests for the pure-Python kernels (no Spark)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from logport_spark.observability import escape_to_json_string, observer_entry
from logport_spark.operators.parse import json_quote
from logport_spark.oracle import build_envelope, format_timestamp


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_json_quote_equals_dumps(s):
    """The envelope UDF's fast path must be byte-identical to json.dumps."""
    assert json_quote(s) == json.dumps(s, ensure_ascii=False)


@given(st.text(max_size=200).filter(lambda s: "\x01" not in s and "\x02" not in s))
@settings(max_examples=300, deadline=None)
def test_observer_escaper_only_seven_cases(s):
    out = escape_to_json_string(s)
    # reversing the 7 escapes recovers the input (escaper is injective here)
    back = (
        out.replace('\\"', '\x01').replace("\\\\", "\x02").replace("\\b", "\b")
        .replace("\\f", "\f").replace("\\n", "\n").replace("\\r", "\r")
        .replace("\\t", "\t").replace("\x01", '"').replace("\x02", "\\")
    )
    assert back == s
    # never produces \uXXXX control escapes (the dialect difference)
    assert "\\u00" not in out or "\\u00" in s


@given(st.text(min_size=1, max_size=120).filter(lambda s: not s.startswith("{")))
@settings(max_examples=300, deadline=None)
def test_observer_entry_parses_when_payload_plain(s):
    # non-{ payloads yield valid JSON iff the raw string has no control bytes
    e = observer_entry(s, ts_str="1.000000000")
    if not any(ord(c) < 0x20 for c in s):
        obj = json.loads(e)
        assert obj["log"] == s


@given(st.text(min_size=1, max_size=200), st.text(max_size=20), st.text(max_size=20))
@settings(max_examples=300, deadline=None)
def test_envelope_is_valid_json_with_exactly_one_payload_key(line, prd, host):
    rec, is_obj, fail = build_envelope(line, "1.000000000", host, "https://u", prd, "")
    obj = json.loads(rec)
    assert ("log" in obj) != ("log_obj" in obj)
    assert is_obj == ("log_obj" in obj)
    if not is_obj:
        assert obj["log"] == line
    assert obj["@timestamp"] == "1.000000000"
    assert ("host" in obj) == bool(host)
    assert ("prd" in obj) == bool(prd)
    # compact + sorted serialization invariant
    assert rec == json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


@given(st.integers(min_value=0, max_value=2**33), st.integers(min_value=0, max_value=999999))
@settings(max_examples=200, deadline=None)
def test_timestamp_format(sec, micros):
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(sec, tz=timezone.utc).replace(microsecond=micros)
    out = format_timestamp(ts)
    s, _, ns = out.partition(".")
    assert int(s) == sec and len(ns) == 9 and int(ns) == micros * 1000


_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~/?&=#%:@+", min_size=0, max_size=40)


@given(st.sampled_from(["http", "https", "ftp", "HTTPS"]),
       st.text(alphabet="abcEX019.-", min_size=1, max_size=20),
       st.sampled_from(["", ":80", ":443", ":8080"]),
       _URL_CHARS)
@settings(max_examples=500, deadline=None)
def test_canonical_url_idempotent(scheme, host, port, tail):
    """canon(canon(u)) == canon(u) — the property a canonicalizer must
    have, else url_dedup's grouping key depends on how many times the
    pipeline ran. Exercises scheme/host case, default and non-default
    ports, and arbitrary path/query/fragment tails."""
    from logport_spark.operators.dedup import canonical_url_py

    u = f"{scheme}://{host}{port}/{tail}"
    once = canonical_url_py(u)
    assert canonical_url_py(once) == once
