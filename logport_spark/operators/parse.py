"""Parse hot path: line framing → empty filter → JSON-detect → envelope.

Reference semantics (re-expressed, not ported):
- P1 chunk→line framing (src/InotifyWatcher.cc:346-415): here each page's
  `text` is self-contained, so framing is a vectorized
  `posexplode(split(text, '\n'))` — pure JVM, whole-stage codegen.
- P2 empty-line filter (src/InotifyWatcher.cc:377-400): `length(line) > 0`.
- P3+P4 JSON-detect + envelope (src/Watch.cc:377-426): byte-exact envelope
  built in an Arrow-vectorized pandas UDF (`json.dumps(sort_keys=True,
  separators=(',',':'))` matches nlohmann's sorted-compact dump). Spark's
  `to_json` cannot reproduce sorted keys over a dynamic `log_obj`, hence the
  UDF — the only Python in the pipeline, and it is batch-vectorized via
  Arrow (no per-row Python UDFs anywhere).
- P5 timestamping (src/Common.cc:253-270): "%lld.%.9ld" — derived
  deterministically from `warc_ts` (epoch seconds + 9-digit nanos), never
  wall clock, computed JVM-side.
- P6 scrub hook (src/Watch.cc:381-396, commented-out credit-card redaction):
  optional pre-parse tombstone stage, disabled by default.

Scale notes: the UDF is a narrow map — no shuffle; Arrow batch size is
session-tuned (10k rows). Column pruning matters: `html` (binary, the
widest column) is never read by this path — verify with .explain()
ReadSchema.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_RESULT = T.StructType(
    [
        T.StructField("record", T.StringType()),
        T.StructField("is_obj", T.BooleanType()),
        T.StructField("parse_fail", T.BooleanType()),
    ]
)

# our tombstone for the (disabled-by-default) scrub hook
SCRUB_TOMBSTONE = json.dumps(
    {"filtered": "card_number_detected"}, sort_keys=True, separators=(",", ":")
)


def ts_string(warc_ts: Column) -> Column:
    """'%lld.%.9ld' epoch-sec.9-digit-ns string from a timestamp column (JVM)."""
    micros = F.unix_micros(warc_ts)
    sec = F.floor(micros / F.lit(1_000_000)).cast("long")
    nanos = (micros - sec * F.lit(1_000_000)) * F.lit(1000)
    return F.concat(sec.cast("string"), F.lit("."), F.lpad(nanos.cast("string"), 9, "0"))


def explode_lines(pages: DataFrame, keep_cols: tuple[str, ...] = ("url", "warc_ts", "lang")) -> DataFrame:
    """P1+P2: one row per non-empty line, with 1-based line_no."""
    exploded = pages.select(
        *keep_cols, F.posexplode(F.split(F.col("text"), "\n")).alias("line_idx", "line")
    )
    return exploded.withColumn("line_no", (F.col("line_idx") + 1).cast("int")).drop(
        "line_idx"
    ).filter(F.length("line") > 0)


_SPECIALS = set('"\\') | {chr(i) for i in range(32)}  # chars forcing real escaping


def json_quote(x: str) -> str:
    """JSON string-encode with a plain-string fast path. Byte-identical to
    json.dumps(x, ensure_ascii=False) for every input (property-tested)."""
    return json.dumps(x, ensure_ascii=False) if _SPECIALS.intersection(x) else '"' + x + '"'


@F.pandas_udf(ENVELOPE_RESULT)
def envelope_udf(
    line: pd.Series,
    ts: pd.Series,
    host: pd.Series,
    source: pd.Series,
    prd: pd.Series,
    log_type: pd.Series,
) -> pd.DataFrame:
    """Arrow-vectorized envelope builder (P3+P4). One batch in, one out.

    Keys serialize in sorted order (@timestamp < host < log/log_obj <
    log_type < prd < source — '@' precedes letters, 'log_o' < 'log_t'), so
    the envelope is assembled by direct string concatenation; json.dumps of
    a full dict runs never, json.loads/dumps only for `{`/`[` payloads.
    The (host, prd, log_type) fragments are route constants — a handful of
    distinct values per batch — and are memoized. host/prd/log_type arrive
    as (possibly null) per-row columns from the broadcast-joined route;
    empty/null ⇒ key omitted (src/Watch.cc:406-410)."""
    dumps = json.dumps
    loads = json.loads
    jq = json_quote

    records = []
    is_objs = []
    fails = []
    cache: dict = {}
    for ln, t, h, s, p, lt in zip(
        line.to_numpy(), ts.to_numpy(), host.to_numpy(), source.to_numpy(),
        prd.to_numpy(), log_type.to_numpy(),
    ):
        k = (h, p, lt)
        parts = cache.get(k)
        if parts is None:
            hp = ',"host":' + dumps(h, ensure_ascii=False) if h else ""
            sufa = (',"log_type":' + dumps(lt, ensure_ascii=False) if lt else "") + (
                ',"prd":' + dumps(p, ensure_ascii=False) if p else ""
            )
            parts = (hp, sufa)
            cache[k] = parts
        hp, sufa = parts
        is_obj = False
        fail = False
        c = ln[0] if ln else ""
        if c == "{" or c == "[":
            try:
                mid = ',"log_obj":' + dumps(
                    loads(ln), sort_keys=True, separators=(",", ":"), ensure_ascii=False
                )
                is_obj = True
            except ValueError:
                mid = ',"log":' + jq(ln)
                fail = True
        else:
            mid = ',"log":' + jq(ln)
        records.append(
            '{"@timestamp":"' + t + '"' + hp + mid + sufa
            + (',"source":' + jq(s) if s else "") + "}"
        )
        is_objs.append(is_obj)
        fails.append(fail)
    return pd.DataFrame({"record": records, "is_obj": is_objs, "parse_fail": fails})


def scrub(df: DataFrame, enabled: bool = False) -> DataFrame:
    """P6: replace unredacted card-number lines with a tombstone (off by default)."""
    if not enabled:
        return df
    trigger = F.col("line").contains('"card_number":"') & ~F.col("line").contains("XXX")
    return df.withColumn("line", F.when(trigger, F.lit(SCRUB_TOMBSTONE)).otherwise(F.col("line")))


def with_envelope(
    lines: DataFrame,
    host_col: Column,
    source_col: Column,
    prd_col: Column,
    log_type_col: Column,
) -> DataFrame:
    """Attach record/is_obj/parse_fail + record_bytes to a lines DataFrame."""
    df = lines.withColumn("ts_str", ts_string(F.col("warc_ts")))
    df = df.withColumn(
        "env",
        envelope_udf(F.col("line"), F.col("ts_str"), host_col, source_col, prd_col, log_type_col),
    )
    return (
        df.select("*", "env.record", "env.is_obj", "env.parse_fail")
        .drop("env")
        .withColumn("record_bytes", F.octet_length("record").cast("long"))
    )
