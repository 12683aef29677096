"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse→enrich→route→aggregate pipeline on
the sf0.001 synthetic pages table. `queries()` exposes each implemented
operator from SURVEY.md §2 as a (spark, sf_dir) → DataFrame callable, and
`oracle_sql()` gives the DuckDB-equivalent ANSI SQL. The `pages` input table
(BASELINE.json input_hint shape) is synthesized deterministically (seed=42)
by logport_spark.datagen; its parquet lives under /root/repo/data so the
DuckDB oracle can read the identical bytes.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logport_spark import datagen

DATA = datagen.DATA_DIR
PAGES_001 = f"{DATA}/pages_sf0.01"  # oracle runs at sf=0.01


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf = datagen.sf_of_dir(sf_dir)
    path = datagen.ensure_pages(sf, spark=spark)
    datagen.ensure_lookups()
    return spark.read.parquet(path)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline on sf0.001 pages → per-sink metrics."""
    from logport_spark.plans.pipeline import parsed_routed, sink_metrics

    pages = _pages(spark, "/root/testdata/sf0.001")
    return sink_metrics(parsed_routed(spark, pages)).orderBy("sink")


# ---------------------------------------------------------------- queries --

def _lp_parse_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logport_spark.operators.parse import explode_lines

    return explode_lines(_pages(spark, sf_dir)).select("url", "line_no", "line")


def _lp_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logport_spark.operators.enrich import enrich, load_lookups, with_domain
    from logport_spark.operators.route import resolve_route

    pages = _pages(spark, sf_dir).select("url", "lang")
    lookups = load_lookups(spark)
    df = enrich(with_domain(pages), lookups)
    df = resolve_route(df, lookups["routes"])
    return df.select("url", "domain", "tld", "category", "lang", "locale", "sink")


def _lp_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logport_spark.plans.pipeline import parsed_routed

    routed = parsed_routed(spark, _pages(spark, sf_dir))
    return routed.select("url", "line_no", "record", "parse_fail", "sink")


def _lp_sink_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logport_spark.plans.pipeline import parsed_routed, sink_metrics

    return sink_metrics(parsed_routed(spark, _pages(spark, sf_dir)))


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lp_parse_lines": _lp_parse_lines,
        "lp_enrich": _lp_enrich,
        "lp_envelope": _lp_envelope,
        "lp_sink_metrics": _lp_sink_metrics,
        "q1_pricing_summary": _q1_pricing_summary,
        "events_hourly": _events_hourly,
    }


# ------------------------------------------------------------- oracle SQL --

_PAGES = f"read_parquet('{PAGES_001}/*.parquet')"
_DOMAIN_TLD = f"read_parquet('{DATA}/domain_tld/*.parquet')"
_LANG_LOCALE = f"read_parquet('{DATA}/lang_locale/*.parquet')"
_ROUTES = f"read_parquet('{DATA}/routes/*.parquet')"

# shared CTE: non-empty lines with 1-based line numbers (zip-unnest)
_LINES_CTE = f"""
WITH split AS (
  SELECT url, warc_ts, lang, string_split(text, chr(10)) AS parts
  FROM {_PAGES}
), numbered AS (
  SELECT url, warc_ts, lang,
         unnest(generate_series(1, len(parts))) AS line_no,
         unnest(parts) AS line
  FROM split
), lines AS (
  SELECT url, warc_ts, lang, CAST(line_no AS INT) AS line_no, line
  FROM numbered WHERE length(line) > 0
)
"""

# enrichment+routing of distinct urls
_ENRICHED_CTE = f"""
, enriched AS (
  SELECT l.*, dt.tld, dt.category,
         ll.locale,
         r.sink, r.hostname, r.product_code, r.log_type
  FROM (SELECT *, split_part(split_part(url, '://', 2), '/', 1) AS domain FROM lines) l
  LEFT JOIN {_DOMAIN_TLD} dt USING (domain)
  LEFT JOIN {_LANG_LOCALE} ll USING (lang)
  LEFT JOIN {_ROUTES} r ON r.route_key = coalesce(dt.category, '__default__')
)
"""

# byte-exact envelope: keys in sorted order (@timestamp, host, log|log_obj,
# log_type, prd, source); JSON lines are canonical by construction so the
# oracle embeds the raw line where the engine re-serializes
_ENVELOPE_EXPR = """
  '{"@timestamp":"' || (epoch_us(warc_ts) // 1000000)::VARCHAR || '.' ||
      lpad(((epoch_us(warc_ts) % 1000000) * 1000)::VARCHAR, 9, '0') || '"' ||
  CASE WHEN hostname IS NOT NULL AND hostname != ''
       THEN ',"host":' || to_json(hostname) ELSE '' END ||
  CASE WHEN substr(line, 1, 1) IN ('{', '[') AND json_valid(line)
       THEN ',"log_obj":' || line
       ELSE ',"log":' || to_json(line) END ||
  CASE WHEN log_type IS NOT NULL AND log_type != ''
       THEN ',"log_type":' || to_json(log_type) ELSE '' END ||
  CASE WHEN product_code IS NOT NULL AND product_code != ''
       THEN ',"prd":' || to_json(product_code) ELSE '' END ||
  ',"source":' || to_json(url) || '}'
"""

_PARSE_FAIL_EXPR = "substr(line, 1, 1) IN ('{', '[') AND NOT json_valid(line)"


def oracle_sql() -> dict[str, str]:
    return {
        "lp_parse_lines": _LINES_CTE + "SELECT url, line_no, line FROM lines",
        "lp_enrich": f"""
            WITH pages AS (
              SELECT url, lang,
                     split_part(split_part(url, '://', 2), '/', 1) AS domain
              FROM {_PAGES}
            )
            SELECT p.url, p.domain, dt.tld, dt.category, p.lang, ll.locale, r.sink
            FROM pages p
            LEFT JOIN {_DOMAIN_TLD} dt USING (domain)
            LEFT JOIN {_LANG_LOCALE} ll USING (lang)
            LEFT JOIN {_ROUTES} r ON r.route_key = coalesce(dt.category, '__default__')
        """,
        "lp_envelope": _LINES_CTE + _ENRICHED_CTE + f"""
            SELECT url, line_no, {_ENVELOPE_EXPR} AS record,
                   ({_PARSE_FAIL_EXPR}) AS parse_fail, sink
            FROM enriched
        """,
        "lp_sink_metrics": _LINES_CTE + _ENRICHED_CTE + f"""
            SELECT sink,
                   count(*) AS rows_routed,
                   sum(strlen({_ENVELOPE_EXPR}) + 1) AS bytes_shipped,
                   sum(CASE WHEN {_PARSE_FAIL_EXPR} THEN 1 ELSE 0 END) AS parse_failures
            FROM enriched GROUP BY sink
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
    }
