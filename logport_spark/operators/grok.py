"""Vectorized grok/regex parse stage (the north_rule's "grok/regex parser").

Structured-field extraction from unstructured log lines, entirely JVM-side
(`regexp_extract` inside whole-stage codegen — no Python). Patterns are
grok-style named templates compiled to plain regexes; unmatched lines keep
NULL fields and a matched=false flag, mirroring the reference's fall-through
behavior for non-JSON lines (src/Watch.cc:413-414 routes them unparsed —
our grok stage is the extension point the commented scrub hook hints at,
src/Watch.cc:381-396).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# grok-style templates: name -> (regex, [(field, group_index, cast_type)])
GROK_PATTERNS: dict[str, tuple[str, list[tuple[str, int, str]]]] = {
    "http_access": (
        r"^(GET|POST|PUT|DELETE|HEAD) (/\S+) ([1-5][0-9]{2}) ([0-9]+)",
        [
            ("method", 1, "string"),
            ("path", 2, "string"),
            ("status", 3, "int"),
            ("resp_bytes", 4, "long"),
        ],
    ),
    "kv_level": (
        r'^\{"code":([0-9]+),"level":"(\w+)"',
        [("code", 1, "int"), ("level", 2, "string")],
    ),
}


def grok(df: DataFrame, pattern: str = "http_access", line_col: str = "line") -> DataFrame:
    """Extract structured fields; adds `grok_matched` + one column per field."""
    regex, fields = GROK_PATTERNS[pattern]
    out = df.withColumn(
        "grok_matched", F.regexp_extract(F.col(line_col), regex, 0) != ""
    )
    for name, idx, typ in fields:
        raw = F.regexp_extract(F.col(line_col), regex, idx)
        col = F.when(F.col("grok_matched"), raw.cast(typ)).otherwise(F.lit(None).cast(typ))
        out = out.withColumn(name, col)
    return out


def grok_summary(df: DataFrame, pattern: str = "http_access") -> DataFrame:
    """Per-(method, status-class) counts + byte totals over matched lines."""
    g = grok(df, pattern).filter(F.col("grok_matched"))
    return g.groupBy(
        "method", F.floor(F.col("status") / 100).cast("int").alias("status_class")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("resp_bytes").alias("total_bytes"),
    )
