"""The `pages` source (BASELINE.json input_hint shape):
pages(url string, warc_ts timestamp, html binary, text string, lang string).

Batch: a plain parquet scan — declare columns downstream and Catalyst prunes
`html` (the widest column) out of ReadSchema unless a multimodal op asks for
it. Streaming: incremental file discovery, the inotify IN_MODIFY analog
(reference src/InotifyWatcher.cc:252-510), with maxFilesPerTrigger as the
bounded in-flight queue (src/KafkaProducer.cc:385-423)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Batch scan of a pages table (parquet dir; Iceberg `spark.table()` on
    a real cluster — same downstream plan)."""
    return spark.read.parquet(path)


def stream_pages(spark: SparkSession, path: str, max_files: int = 2) -> DataFrame:
    """Incremental scan: new files under `path` become micro-batches."""
    from ..streaming.stream import pages_stream

    return pages_stream(spark, path, max_files=max_files)
