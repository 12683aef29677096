"""Differential fuzz: the Spark envelope kernel vs the REFERENCE serializer.

The byte-exactness claim (SURVEY.md §1.4) previously rested on the
documented `json.dumps(sort_keys=True, separators=compact,
ensure_ascii=False) ≡ nlohmann::json::dump()` argument. This test removes
the argument and substitutes the machine: tools/envelope_ref.cc compiles
Watch::filterLogLine (/root/reference/src/Watch.cc:377-426) against the
reference's own vendored nlohmann 3.10.5, and we compare envelopes
byte-for-byte on >10^4 generated lines across every adversarial class the
serializers could disagree on (control chars, astral unicode, nested JSON,
floats at format boundaries, malformed candidates, duplicate keys,
whitespace normalization, unicode-escape re-encoding).

Documented divergence classes, EXCLUDED from generation (the fuzz found /
confirmed them; the kernel matches the reference on everything else):

- integers beyond uint64: nlohmann parses them lossily as double
  ("1e+30"), Python keeps exact digits. Out-of-int-range literals are a
  corpus pathology with no right answer; we keep Python's exact digits.
- lone UTF-16 surrogate escapes ("\\ud800" unpaired): nlohmann rejects at
  parse (→ log fallback); Python accepts at parse then cannot UTF-8-encode
  at the Arrow boundary. Not representable in a valid-UTF-8 corpus column.
- NaN/Infinity literals and overflow-to-inf ('1e400') are NOT excluded —
  the kernel rejects them to match nlohmann (parse_constant +
  allow_nan=False in json_mid_udf) and the generator covers them.

Skipped when g++ or the reference header is unavailable.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import string as _string
import subprocess

import pytest
from pyspark.sql import functions as F

REF_INCLUDE = "/root/reference/include"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "..", "tools",
                           "envelope_ref.cc")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None
    or not os.path.exists(os.path.join(REF_INCLUDE, "json.hpp")),
    reason="needs g++ and the reference's vendored json.hpp")


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("envref") / "envelope_ref")
    subprocess.run(
        ["g++", "-std=c++17", "-O1", "-I", REF_INCLUDE,
         os.path.abspath(HARNESS_SRC), "/root/reference/src/Url.cc",
         "-o", exe],
        check=True, capture_output=True, timeout=600)
    return exe


# ---------------------------------------------------------------- corpus

_CTRL = [chr(i) for i in range(32)]
_WEIRD = ['"', "\\", "/", "\x7f", "é", "€", "あ",
          "\U0001f600", "\U0001d11e", "é", " ", " ",
          "﻿", "\x00", "\t"]


def _text(rng: random.Random, n: int, pool: str | list) -> str:
    return "".join(rng.choice(pool) for _ in range(n))


def _weird_string(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 12)):
        r = rng.random()
        if r < 0.4:
            parts.append(_text(rng, rng.randint(1, 8),
                                _string.ascii_letters + _string.digits
                                + " .,:-_"))
        elif r < 0.7:
            parts.append(rng.choice(_WEIRD))
        else:
            parts.append(rng.choice(_CTRL))
    return "".join(parts)


def _json_value(rng: random.Random, depth: int):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        k = rng.random()
        if k < 0.25:
            return _weird_string(rng)
        if k < 0.45:   # int64 range (beyond-uint64 is the documented
            # divergence class — excluded)
            return rng.choice([
                0, -1, 1, 2**31, -(2**31) - 1, 2**53, 2**63 - 1,
                -(2**63), 2**64 - 1, rng.randint(-(2**62), 2**62)])
        if k < 0.75:
            return rng.choice([
                0.0, -0.0, 0.1, 1.0, -1.5, 1e22, 1e-7, 3.141592653589793,
                1.7976931348623157e308, 2.2250738585072014e-308,
                rng.uniform(-1e6, 1e6),
                rng.uniform(-1, 1) * 10 ** rng.randint(-20, 20)])
        if k < 0.85:
            return rng.choice([True, False])
        return None
    if r < 0.7:
        return {(_weird_string(rng) or "k") + str(i): _json_value(rng, depth - 1)
                for i in range(rng.randint(0, 4))}
    return [_json_value(rng, depth - 1) for _ in range(rng.randint(0, 4))]


def _valid_json_line(rng: random.Random) -> str:
    top = _json_value(rng, rng.randint(1, 4))
    if not isinstance(top, (dict, list)):
        top = rng.choice([{"v": top}, [top]])
    return json.dumps(
        top,
        ensure_ascii=rng.random() < 0.5,        # \uXXXX re-encode path
        sort_keys=rng.random() < 0.5,
        indent=rng.choice([None, None, 1, 2]),  # whitespace normalization
        separators=rng.choice([None, (",", ":"), (", ", ": ")]))


_MALFORMED = [
    "{", "[", "{]", "[}", '{"a":}', '{"a":1,}', "[1,2,", '{"a" 1}',
    '{"a":1}trailing', "[1, 2] ,", "{'single':1}", '{"a":+1}', '{"a":01}',
    '{"a":.5}', '{"a":1.}', '{"a":1e}', '{"a":--1}', '{"a":"\\x41"}',
    '{"a":"unterminated', '["\\q"]', "{not json at all", "[also not json",
    '{"a": NaN}', '{"a": Infinity}', '[-Infinity]',       # nlohmann rejects
    '{"a": 1e400}', '[-1e400]', '{"a": 1e-100000}',       # overflow paths
    '{"дупл":1, "дупл":2}',
]


def _cases(n_random: int, seed: int = 20260819):
    """Deterministic adversarial corpus: ~n_random random cases + the fixed
    malformed/boundary pool, each with randomized envelope fields."""
    rng = random.Random(seed)
    lines = []
    for _ in range(n_random):
        r = rng.random()
        if r < 0.30:
            ln = _text(rng, rng.randint(1, 60),
                       _string.printable.replace("\n", "").replace("\r", "")
                       .replace("\x0b", "").replace("\x0c", ""))
            if ln and ln[0] in "{[":
                ln = "x" + ln
        elif r < 0.45:
            ln = _weird_string(rng) or "x"
        elif r < 0.80:
            ln = _valid_json_line(rng)
        elif r < 0.90:
            base = _valid_json_line(rng)
            cut = rng.randint(0, len(base))
            ln = base[:cut] or "{"
        else:
            ln = rng.choice(_MALFORMED)
        lines.append(ln)
    lines.extend(_MALFORMED)
    lines.extend(['{"a":1,"a":2}', "{}", "[]", "[0]", '{"":""}',
                  '{"a":{"b":[1,2,{"c":null}]}}', "[1.0, 1, -0.0, -0]",
                  '{"\\u00e9":"\\u20ac"}', '["\\ud83d\\ude00"]',
                  '  {"a":1}', "\t[1]"])
    cases = []
    for i, ln in enumerate(lines):
        # newlines can't occur in a LINE (the framing stage split them out)
        ln = ln.replace("\n", " ").replace("\r", " ") or "x"
        cases.append({
            "id": i,
            "line": ln,
            "ts_us": 1_600_000_000_000_000 + rng.randint(0, 10**9),
            "host": rng.choice(["", "web-01", _weird_string(rng)]),
            "source": rng.choice(["", "/var/log/app.log",
                                  _weird_string(rng)]),
            "prd": rng.choice(["", "prd4096", _weird_string(rng)]),
            "log_type": rng.choice(["", "access", _weird_string(rng)]),
        })
    return cases


def test_dtoa_matches_reference_on_fuzzed_doubles(harness):
    """operators/dtoa.py (the from-paper Grisu2 reimplementation the
    kernel uses for candidate-line floats) vs nlohmann's own dtoa, driven
    through the compiled reference header: 60k uniform bit patterns plus
    the adversarial bands (format cutovers at 1e±15/1e16/1e22, exact
    powers of two where the lower boundary is closer, denormals)."""
    import struct

    from logport_spark.operators.dtoa import nlohmann_repr

    rng = random.Random(12345)
    bits = []
    while len(bits) < 60_000:
        b = rng.getrandbits(64)
        if ((b >> 52) & 0x7FF) != 0x7FF:        # skip nan/inf
            bits.append(b)
    for base in (1e-6, 1e-5, 1e-4, 1.0, 1e14, 1e15, 1e16, 1e21, 1e22):
        b0 = struct.unpack("<Q", struct.pack("<d", base))[0]
        bits.extend(b0 + d for d in range(-50, 51))
    for k in range(-1074, 1024, 7):             # powers of 2 + denormals
        bits.append(struct.unpack(
            "<Q", struct.pack("<d", float(2.0 ** max(k, -1022))
                              * (2.0 ** min(0, k + 1022))))[0])
    bits.extend(rng.getrandbits(52) for _ in range(3000))
    bits = [b for b in bits if ((b >> 52) & 0x7FF) != 0x7FF]

    stdin = "\n".join(format(b, "016x") for b in bits)
    out = subprocess.run([harness, "--dtoa"], input=stdin.encode(),
                         capture_output=True, timeout=600, check=True)
    expected = out.stdout.decode().split("\n")[:-1]
    assert len(expected) == len(bits)
    bad = [(format(b, "016x"), e,
            nlohmann_repr(struct.unpack("<d", struct.pack("<Q", b))[0]))
           for b, e in zip(bits, expected)
           if nlohmann_repr(struct.unpack("<d", struct.pack("<Q", b))[0])
           != e]
    assert not bad, f"{len(bad)} dtoa mismatches; first 5: {bad[:5]}"


def test_broker_url_fields_match_reference_parser(spark, harness):
    """The conn-template derivation (wire.connection_templates: scheme /
    username / password / host / resolved port / path) vs the reference's
    own URL parser compiled from source (homer::Url, src/Url.cc — the
    object KafkaProducer/HttpProducer dial), over the well-formed broker
    class `scheme://[user[:pass]@]host[:port][/path][?q][#f]`. The port
    check covers both explicit :port and the full scheme-default table
    (Url.cc:52-74). Documented out-of-class divergences, excluded here
    (the last two FOUND by this fuzz's first run, verified by hand
    against the sources):
    * percent-escapes in paths — homer's getPath unescapes, the engine
      keeps the wire path raw;
    * schemeless strings — homer parses 'host:9092' as scheme='host';
      UrlList-level handling treats them as kafka (our
      validate_scheme_consistency contract);
    * a reference-parser BUG: with '?' or '#' present but NO '/' path
      ('kafka://h:1?x=y'), homer captures the AUTHORITY text as the path
      (fromString starts the ?/# capture at the authority when
      moveBefore('/') fails, src/Url.cc:237-262) — the engine's empty
      path is correct, so the fuzz emits ?/# only after a real path
      (recorded in SURVEY §2.8);
    * java.net.URI strictness: Spark's parse_url returns NULL host when
      the LAST host label starts with a digit (RFC 2396 toplabel) —
      digit-leading TLDs route to the default sink; the generator keeps
      TLD labels alpha-first."""
    from pyspark.sql import functions as F

    from logport_spark.operators.wire import resolved_port

    rng = random.Random(99173)
    schemes = ["http", "https", "kafka", "redis", "postgres", "postgresql",
               "mysql", "zookeeper", "ldap", "ldaps", "ftp", "ssh",
               "mongo+srv", "Kafka", "HTTPS"]          # case-folding too
    urls = []
    for _ in range(3000):
        sch = rng.choice(schemes)
        user = ""
        if rng.random() < 0.4:
            user = _text(rng, rng.randint(1, 8), _string.ascii_letters)
            if rng.random() < 0.6:
                user += ":" + _text(rng, rng.randint(1, 8),
                                    _string.ascii_letters + _string.digits)
            user += "@"
        # labels alpha-first: java.net.URI NULLs the host on digit-leading
        # toplabels (documented divergence above)
        host = ".".join(
            rng.choice(_string.ascii_lowercase)
            + _text(rng, rng.randint(0, 7),
                    _string.ascii_lowercase + _string.digits)
            for _ in range(rng.randint(1, 3)))
        port = f":{rng.randint(1, 65535)}" if rng.random() < 0.5 else ""
        path = ("/" + "/".join(_text(rng, rng.randint(1, 6),
                                     _string.ascii_letters + _string.digits
                                     + "._-")
                               for _ in range(rng.randint(1, 3)))
                if rng.random() < 0.5 else "")
        # ?/# only after a real path (the homer authority-as-path quirk)
        q = (f"?k={rng.randint(0, 99)}&x=y"
             if path and rng.random() < 0.4 else "")
        frag = f"#f{rng.randint(0, 9)}" if path and rng.random() < 0.3 else ""
        urls.append(f"{sch}://{user}{host}{port}{path}{q}{frag}")

    u = F.col("u")
    userinfo = F.coalesce(F.parse_url(u, F.lit("USERINFO")), F.lit(""))
    got = {r.id: r for r in spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], "id long, u string").select(
        "id",
        F.lower(F.parse_url(u, F.lit("PROTOCOL"))).alias("scheme"),
        F.substring_index(userinfo, ":", 1).alias("username"),
        F.when(userinfo.contains(":"),
               F.substring_index(userinfo, ":", -1)).otherwise(F.lit(""))
        .alias("password"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        resolved_port(u).alias("port"),
        F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")).alias("path"),
    ).collect()}

    stdin = "\n".join(json.dumps({"url": x}, ensure_ascii=True)
                      for x in urls)
    proc = subprocess.run([harness, "--url"], input=stdin.encode(),
                          capture_output=True, timeout=600, check=True)
    refs = [json.loads(ln) for ln in
            proc.stdout.decode().split("\n")[:-1]]
    assert len(refs) == len(urls)

    bad = []
    for i, (x, ref) in enumerate(zip(urls, refs)):
        g = got[i]
        mine = {"scheme": g.scheme, "username": g.username,
                "password": g.password, "host": g.host, "port": g.port,
                "path": g.path}
        want = {k: ref[k] for k in mine}
        if mine != want:
            bad.append((x, want, mine))
    assert not bad, f"{len(bad)} URL-field mismatches: {bad[:5]}"


def test_ts_string_matches_reference_format(spark, harness):
    """The one injected-not-verified link in the envelope differential:
    both sides receive the SAME ts string there, so the '%lld.%.9ld'
    rendering itself (Common.cc:253-270) needs its own oracle. Compare
    ts_string's JVM rendering against the reference's snprintf over the
    micros-representable domain (warc_ts is a microsecond timestamp, so
    nanos are always micros*1000 — 9 digits, 000-suffixed)."""
    from pyspark.sql import functions as F

    from logport_spark.operators.parse import ts_string

    rng = random.Random(7771)
    micros = ([0, 1, 999_999, 1_000_000, 1_556_311_722_644_052,
               4_102_444_800_000_000]            # 2100-01-01
              + [rng.randint(0, 4_102_444_800_000_000)
                 for _ in range(5000)])
    df = spark.createDataFrame([(i, m) for i, m in enumerate(micros)],
                               "id long, us long")
    got = {r.id: r.ts for r in df.select(
        "id", ts_string(F.timestamp_micros(F.col("us"))).alias("ts"))
        .collect()}

    stdin = "\n".join(f"{m // 1_000_000} {(m % 1_000_000) * 1000}"
                      for m in micros)
    proc = subprocess.run([harness, "--ts"], input=stdin.encode(),
                          capture_output=True, timeout=600, check=True)
    ref = proc.stdout.decode().split("\n")[:-1]
    assert len(ref) == len(micros)
    bad = [(m, ref[i], got[i]) for i, m in enumerate(micros)
           if ref[i] != got[i]]
    assert not bad, f"{len(bad)} ts mismatches: {bad[:5]}"


def test_observer_dialect_matches_reference(spark, harness):
    """The SECOND envelope dialect (Observer::addLogEntry,
    src/Observer.cc:128-149 + the 7-case escaper Common.cc:227-250):
    three-way byte equality — Python observer_entry ≡ the JVM
    observer_line_col column ≡ the reference semantics compiled into the
    harness — over adversarial lines (raw control bytes pass UNescaped in
    this dialect; '{' prefixes embed raw without validation)."""
    from logport_spark.observability import observer_entry

    rng = random.Random(424242)
    lines = []
    for _ in range(4000):
        r = rng.random()
        if r < 0.4:
            lines.append(_weird_string(rng) or "x")
        elif r < 0.7:
            lines.append(_valid_json_line(rng))
        elif r < 0.85:
            lines.append(rng.choice(_MALFORMED))   # '{' garbage embeds RAW
        else:
            lines.append(_text(rng, rng.randint(1, 40),
                               _string.printable.replace("\n", "")
                               .replace("\r", "")))
    cases = [{"id": i,
              "log": ln.replace("\n", " ").replace("\r", " ") or "x",
              "ts": f"160000{i:04d}.{i % 1000:09d}"}
             for i, ln in enumerate(lines)]

    py = [observer_entry(c["log"], ts_str=c["ts"]) for c in cases]

    from pyspark.sql import functions as F

    from logport_spark.observability import observer_line_col

    df = spark.createDataFrame(
        [(c["id"], c["log"], c["ts"]) for c in cases],
        "id long, log string, ts string")
    jvm = {r.id: r.line for r in df.select(
        "id", observer_line_col(F.col("log"), F.col("ts")).alias("line"))
        .collect()}

    stdin = "\n".join(json.dumps({"ts": c["ts"], "log": c["log"]},
                                 ensure_ascii=True) for c in cases)
    proc = subprocess.run([harness, "--observer"],
                          input=stdin.encode("utf-8"),
                          capture_output=True, timeout=600, check=True)
    ref = proc.stdout.decode("utf-8").split("\n")[:-1]
    assert len(ref) == len(cases)

    bad = [(c["log"], ref[i], py[i], jvm[c["id"]])
           for i, c in enumerate(cases)
           if not (ref[i] == py[i] == jvm[c["id"]])]
    assert not bad, f"{len(bad)} observer-dialect mismatches: {bad[:3]}"


def test_envelope_bytes_match_reference_serializer(spark, harness):
    from logport_spark.operators.parse import with_envelope

    cases = _cases(10_500)
    assert len(cases) >= 10_000

    df = spark.createDataFrame(
        [(c["id"], c["line"], c["ts_us"], c["host"], c["source"],
          c["prd"], c["log_type"]) for c in cases],
        "id long, line string, ts_us long, host string, source string, "
        "prd string, log_type string",
    ).withColumn("warc_ts", F.timestamp_micros(F.col("ts_us")))

    got = {r.id: (r.ts_str, r.record)
           for r in with_envelope(df, F.col("host"), F.col("source"),
                                  F.col("prd"), F.col("log_type"))
           .select("id", "ts_str", "record").collect()}
    assert len(got) == len(cases)

    # feed the SAME per-row timestamp string the kernel derived
    stdin = "\n".join(json.dumps(
        {"ts": got[c["id"]][0], "host": c["host"], "source": c["source"],
         "prd": c["prd"], "log_type": c["log_type"], "line": c["line"]},
        ensure_ascii=True) for c in cases)
    proc = subprocess.run([harness], input=stdin.encode("utf-8"),
                          capture_output=True, timeout=600, check=True)
    expected = proc.stdout.decode("utf-8").split("\n")
    assert expected and expected[-1] == ""
    expected = expected[:-1]
    assert len(expected) == len(cases)

    mismatches = [
        (c["line"], expected[i], got[c["id"]][1])
        for i, c in enumerate(cases)
        if expected[i].encode() != got[c["id"]][1].encode()
    ]
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} envelope mismatches vs the "
        f"reference serializer; first 3: {mismatches[:3]}")
