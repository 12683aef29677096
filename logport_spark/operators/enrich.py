"""Enrichment: URL decomposition + broadcast hash joins against small lookups.

Mirrors the reference's side-table reads (watches/settings,
src/Database.cc:65-84) and URL parsing (src/Url.cc:192-359) — Spark-first:
`parse_url` is a JVM built-in, and the lookups are broadcast so enrichment
adds ZERO shuffles regardless of input scale (the lookup tables are
O(domains) ≪ executor memory; at 100 TB the fact side never moves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_ROUTE_KEY
from ..datagen import ensure_lookups


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """P8: registered host from the url (JVM parse_url — no Python)."""
    return df.withColumn("domain", F.parse_url(F.col(url_col), F.lit("HOST")))


def load_lookups(spark: SparkSession) -> dict[str, DataFrame]:
    paths = ensure_lookups()
    return {name: spark.read.parquet(path) for name, path in paths.items()}


def enrich(df: DataFrame, lookups: dict[str, DataFrame]) -> DataFrame:
    """Left broadcast joins: domain→(tld, category), lang→locale.

    Unmatched domains/langs stay (nulls) — they fall through to the default
    route, mirroring logport's settings-precedence defaults
    (src/LogPort.cc:961-1048).
    """
    domain_tld = lookups["domain_tld"].select("domain", "tld", "category")
    lang_locale = lookups["lang_locale"].select("lang", "locale")
    out = df.join(F.broadcast(domain_tld), "domain", "left")
    out = out.join(F.broadcast(lang_locale), "lang", "left")
    return out.withColumn(
        "route_key", F.coalesce(F.col("category"), F.lit(DEFAULT_ROUTE_KEY))
    )
