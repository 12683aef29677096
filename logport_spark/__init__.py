"""logport_spark — a brand-new PySpark-native parse→enrich→route→aggregate
engine with the query/data-processing capabilities of homer6/logport.

NOT a port: the reference (/root/reference, C++ log shipper) defines WHAT to
compute — line framing, empty-line filtering, JSON-detect parsing, envelope
projection, route fan-out, offset-ledger resume, per-sink aggregates
(SURVEY.md §2) — this package re-expresses those semantics Spark-first over
an Iceberg/parquet table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang).

Layout:
  session    — tuned SparkSession factory (Arrow, AQE, UTC)
  config     — RouteSpec/Settings model (analog of logport's SQLite
               watches/settings tables, reference src/Database.cc:65-84)
  datagen    — deterministic synthetic `pages` table (input_hint shape)
  oracle     — pure-Python single-process reference oracle (envelope + counts)
  operators/ — parse (hot path), grok, enrich, route, wire, transport,
               asof, rangejoin, dedup (incl. clustering/contamination),
               similarity, textstats, multimodal
  sources/   — batch/streaming pages reader, testdata tables, lookups
  functions/ — stable column-kernel API (ts_string, jvm_json_quote, ...)
  plans/     — pipeline assembly (the DAG), ledger/resume protocol,
               capability-gated Iceberg sink
  streaming/ — Structured Streaming variant (foreachBatch reuse of batch
               DAG), incremental cross-batch MinHash dedup, adopt
               (process-output source), gated Kafka sink
"""

__version__ = "0.1.0"
