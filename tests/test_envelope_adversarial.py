"""Adversarial byte-identity: the envelope UDF vs the pure-Python oracle on
a seeded corpus of hostile lines — unicode, control bytes, quote/backslash
storms, deep JSON, numeric-formatting traps. The north_rule's per-row
invariant, stress-tested beyond the standard datagen corpus."""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F


def _hostile_lines(n: int = 2000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    pools = [
        # unicode: BMP letters, CJK, emoji-ish astral, combining marks
        lambda: "".join(chr(rng.choice([0x41, 0xE9, 0x4E2D, 0x1F600, 0x0301, 0x430]))
                        for _ in range(rng.randint(1, 20))),
        # quote/backslash storms
        lambda: "".join(rng.choice('"\\/bfnrt xyz') for _ in range(rng.randint(1, 30))),
        # literal pre-escaped-JSON text: backslash-u-hex runs that LOOK like
        # escape sequences (ADVICE r1 — blind escape normalization corrupted
        # these), with and without adjacent real control chars
        lambda: rng.choice([
            "\\u001A", "x\\u001A}", "\\\\u001B", "\\u001a\x1a",
            "pre\\u000Bpost", "\\u001C\\u001c", "tail\\", "\x1b\\u001B",
            "c:\\u001Adir", "\\\\\\u001E", json.dumps({"a": "\\u001A"}),
        ]),
        # control chars (escaped as \\uXXXX by json)
        lambda: "".join(chr(rng.randint(1, 31)) for _ in range(rng.randint(1, 8))),
        # canonical json objects incl. nested + unicode keys
        lambda: json.dumps(
            {"k" + str(rng.randint(0, 9)): rng.randint(-10**9, 10**9),
             "s": "v\\" + chr(rng.randint(0x20, 0x7E)),
             "nested": {"é": [1, "two", None, True, False]}},
            sort_keys=True, separators=(",", ":"), ensure_ascii=False),
        # json arrays
        lambda: json.dumps([rng.randint(0, 99), None, "x\ty"],
                           sort_keys=True, separators=(",", ":"), ensure_ascii=False),
        # malformed json starting { or [
        lambda: rng.choice(['{"a":', "[1,", "{]", '["unterminated', "{\x00}"]),
        # plain ascii
        lambda: " ".join("tok%d" % rng.randint(0, 99) for _ in range(rng.randint(1, 10))),
        # whitespace-adjacent edge cases (never empty — empties are dropped upstream)
        lambda: rng.choice([" ", "  x  ", "\t", " ", "ÿþ"]),
    ]
    return [rng.choice(pools)() for _ in range(n)]


@pytest.fixture(scope="module")
def hostile_pages(spark):
    import pandas as pd

    from logport_spark.datagen import BASE_TS, PAGES_DDL

    lines = _hostile_lines()
    # pack 20 lines per page; lines joined with \n (none are empty)
    rows = []
    for i in range(0, len(lines), 20):
        rows.append({
            "url": f"https://hot.example.com/adv/{i}",
            "warc_ts": BASE_TS,
            "html": b"<x>",
            "text": "\n".join(lines[i:i + 20]),
            "lang": "en",
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_DDL)


def test_hostile_corpus_byte_identity(spark, hostile_pages):
    from logport_spark.oracle import run_oracle
    from logport_spark.plans.pipeline import parsed_routed

    pages_local = [r.asDict() for r in hostile_pages.collect()]
    want = {(r["url"], r["line_no"]): r["record"]
            for r in run_oracle(pages_local)["records"]}
    got = {(r["url"], r["line_no"]): r["record"]
           for r in parsed_routed(spark, hostile_pages)
           .select("url", "line_no", "record").collect()}
    assert len(got) == len(want)
    bad = [(k, got[k], want[k]) for k in want if got.get(k) != want[k]]
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]}"


def test_jvm_json_quote_equals_dumps(spark):
    """jvm_json_quote (the JVM-side escaper) must be byte-identical to
    json.dumps(x, ensure_ascii=False) — including literal backslash-u-hex
    text, which the r1 blind-replace normalization corrupted."""
    import random

    from logport_spark.operators.parse import jvm_json_quote

    rng = random.Random(11)
    cases = _hostile_lines(1500, seed=13)
    # directed cases around every uppercase escape Jackson emits
    for hx in ("000B", "000E", "000F", "001A", "001B", "001C", "001D", "001E", "001F"):
        ctrl = chr(int(hx, 16))
        cases += [
            "\\u" + hx, "\\\\u" + hx, "\\\\\\u" + hx,
            ctrl, ctrl + "\\u" + hx, "\\u" + hx + ctrl,
            "a\\u" + hx + "b" + ctrl, '"\\u' + hx,
        ]
    # random backslash/control/hex soup
    for _ in range(500):
        cases.append("".join(rng.choice("\\u01ABEF\x1a\x0b\"z")
                             for _ in range(rng.randint(1, 24))))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    out = df.select("s", jvm_json_quote(F.col("s")).alias("q")).collect()
    bad = [(r.s, r.q, json.dumps(r.s, ensure_ascii=False)) for r in out
           if r.q != json.dumps(r.s, ensure_ascii=False)]
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]!r}"


def test_hostile_records_are_valid_json(spark, hostile_pages):
    """Every emitted envelope must parse as JSON with the expected keys."""
    from logport_spark.plans.pipeline import parsed_routed

    for r in parsed_routed(spark, hostile_pages).select("record").collect():
        obj = json.loads(r["record"])
        assert "@timestamp" in obj
        assert ("log" in obj) != ("log_obj" in obj)  # exactly one
