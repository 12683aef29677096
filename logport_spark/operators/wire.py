"""HTTP sink wire formats + connection templates (H1-H3, P9, P10).

The reference's HTTP producer batches messages into one of two wire formats
(src/HttpProducer.cc:290-345) and pre-computes per-URL connection templates
— scheme/host/port/path + a Basic-auth header from user:pass via base64
(src/HttpProducer.cc:117-167). Re-expressed Spark-first:

- wire batches: collect_list over a bounded batch key (micro-batch id or an
  explicit batch bucket), then JVM json assembly — used by foreachBatch when
  an HTTP sink is configured;
- connection templates: a driver-side/broadcast DataFrame derived from the
  routes table with parse_url + base64 built-ins (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_NUM_MESSAGES = 1000  # src/HttpProducer.cc:47 default, clamp 1..100000


def clamp_batch_size(n: int) -> int:
    """batch.num.messages clamp (src/HttpProducer.cc:76-85)."""
    return max(1, min(int(n), 100_000))


def batch_messages(records: DataFrame, wire_format: str = "JSON",
                   batch_size: int = BATCH_NUM_MESSAGES,
                   stream_col: str | None = None) -> DataFrame:
    """Group records into wire batches per sink (optionally per sub-stream).

    JSON format        -> {"messages":[...],"count":N}
    KAFKA_JSON_V2_JSON -> {"records":[{"value":<msg>}, ...]}
    (payloads are already-serialized envelope JSON, embedded raw).

    `stream_col` names an extra batching key. The reference runs one producer
    instance per watch, each forming its own batches (src/Watch.cc:122-134,
    src/HttpProducer.cc:47) — a per-sink GLOBAL order only exists per file
    there. At scale the global row_number window (one task per sink) is the
    bottleneck, so callers pass a deterministic sub-stream key (the crc32
    url bucket) and each (sink, stream) batches independently in parallel,
    exactly like the reference's independent per-watch producers."""
    batch_size = clamp_batch_size(batch_size)
    from pyspark.sql import Window

    keys = ["sink"] + ([stream_col] if stream_col else [])
    w = Window.partitionBy(*keys).orderBy("url", "line_no")
    batched = records.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / batch_size)
    )
    # collect_list order is partition-dependent; sort (url, line_no) structs
    # so batch bodies are deterministic byte-for-byte
    grouped = batched.groupBy(*keys, "batch_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(url, line_no, record))),"
            " x -> x.record)"
        ).alias("msgs")
    )
    if wire_format == "KAFKA_JSON_V2_JSON":
        body = F.concat(
            F.lit('{"records":['),
            F.array_join(F.transform("msgs", lambda m: F.concat(F.lit('{"value":'), m, F.lit("}"))), ","),
            F.lit("]}"),
        )
    else:
        body = F.concat(
            F.lit('{"messages":['),
            F.array_join("msgs", ","),
            F.lit('],"count":'),
            F.size("msgs").cast("string"),
            F.lit("}"),
        )
    return grouped.select(*keys, "batch_id", body.alias("body"),
                          F.size("msgs").alias("n_msgs"))


# The reference's scheme→default-port table (homer::Url::getPort,
# /root/reference/src/Url.cc:52-74) — the producers dial host:getPort(),
# so the template must resolve it exactly (differentially tested against
# the compiled Url.cc in tests/test_envelope_differential.py).
DEFAULT_PORTS = {
    "https": 443, "http": 80, "ssh": 22, "ftp": 21, "mysql": 3306,
    "mongo": 27017, "mongo+srv": 27017, "kafka": 9092, "postgres": 5432,
    "postgresql": 5432, "redis": 6379, "zookeeper": 2181, "ldap": 389,
    "ldaps": 636,
}

# explicit :port in the authority (Spark's parse_url has no PORT part;
# the oracle SQL uses the same regex, so both sides share one definition)
URL_PORT_RE = r"^[a-zA-Z+]+://(?:[^@/?#]+@)?[^/:?#]*:([0-9]+)([/?#].*)?$"


def resolved_port(url: Column) -> Column:
    """Connection port: explicit :port if present, else the reference's
    scheme default, else 0 (Url.cc:52-74 semantics)."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    dflt = F.lit(0)
    for s, p in sorted(DEFAULT_PORTS.items()):
        dflt = F.when(scheme == s, F.lit(p)).otherwise(dflt)
    explicit = F.regexp_extract(url, URL_PORT_RE, 1)
    return F.when(explicit != "", explicit.cast("int")).otherwise(dflt)


def connection_templates(routes: DataFrame) -> DataFrame:
    """Pre-computed per-sink connection template from the routes table.

    scheme/host/port/path via parse_url; HTTP(S) targets get an
    Authorization header from userinfo via base64 (F.base64 — P10), exactly
    the precomputation the reference hoists out of the per-message loop
    (HttpProducer/KafkaProducer dial host:getPort(), so the port resolves
    with the reference's scheme-default table)."""
    url = F.col("brokers")
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    userinfo = F.parse_url(url, F.lit("USERINFO"))
    host = F.parse_url(url, F.lit("HOST"))
    path = F.parse_url(url, F.lit("PATH"))
    is_http = scheme.isin("http", "https")
    auth = F.when(
        is_http & userinfo.isNotNull() & (userinfo != ""),
        F.concat(F.lit("Basic "), F.base64(userinfo.cast("binary"))),
    ).otherwise(F.lit(None).cast("string"))
    return routes.select(
        "sink",
        scheme.alias("scheme"),
        F.when(is_http, F.lit("HTTP")).otherwise(F.lit("KAFKA")).alias("producer_type"),
        host.alias("host"),
        resolved_port(url).alias("port"),
        F.coalesce(path, F.lit("")).alias("path"),
        auth.alias("auth_header"),
        is_http.alias("is_http"),
    )
