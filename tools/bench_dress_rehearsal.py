"""sf1 end-to-end dress rehearsal (r4 verdict #8): the full
crawl→curate→export chain at 1M pages, stages CHAINED on disk (each stage
reads the previous stage's parquet, exactly as a production run would),
with per-stage wall time, rows in/out, and peak on-disk footprint — the
closest single-box proxy for the 100 TB composition cost.

  stage 1  web_curation      1M pages → curated (url, text, n_kept)
  stage 2  corpus_clean_v2   curated docs → gated + near-dup-dropped set
  stage 3  training_export   cleaned docs → token-budget → shard manifest

Run: python tools/bench_dress_rehearsal.py   (one JSON line; numbers land
in BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logport_spark import datagen  # noqa: E402
from logport_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_REHEARSAL_SF", "1")   # 1 → 1M pages
OUT = os.path.join(datagen.DATA_DIR, f"rehearsal_sf{SF}")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    spark = get_spark("dress_rehearsal", cpus=32, shuffle_partitions=32)
    out: dict = {"sf": SF, "load_avg_start": round(os.getloadavg()[0], 2),
                 "stages": {}}
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    peak = 0

    t0 = time.time()
    pages_dir = datagen.ensure_pages(SF, spark=spark)
    out["gen_sec"] = round(time.time() - t0, 1)
    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    out["n_pages"] = n_pages

    def stage(name: str, n_in: int, fn) -> int:
        nonlocal peak
        t0 = time.time()
        n_out = fn()
        dt = time.time() - t0
        disk = du(OUT)
        peak = max(peak, disk)
        out["stages"][name] = {
            "sec": round(dt, 1), "rows_in": n_in, "rows_out": n_out,
            "rows_per_sec": round(n_in / dt, 1),
            "disk_bytes_after": disk}
        print(f"  {name}: {dt:.1f}s  {n_in:,} -> {n_out:,} rows  "
              f"disk {disk/1e6:.0f} MB", file=sys.stderr)
        return n_out

    # ---- stage 1: web curation over the raw pages table -----------------
    def s1():
        from logport_spark.operators.dedup import (dedup_lines_corpus,
                                                   strip_boilerplate_lines,
                                                   url_dedup)

        p = pages.select("url", "warc_ts", "text")
        surv = url_dedup(p).select("url")
        base = p.join(surv, "url", "left_semi").select("url", "text")
        nb = (strip_boilerplate_lines(base, min_docs=20, id_col="url")
              .withColumnRenamed("doc_id", "url"))
        dd = (dedup_lines_corpus(nb.select("url", "text"), id_col="url")
              .withColumnRenamed("doc_id", "url"))
        (dd.filter(F.col("n_kept") >= 2)
         .select(F.xxhash64("url").alias("doc_id"), "url", "text")
         .write.mode("overwrite").parquet(OUT + "/curated"))
        return spark.read.parquet(OUT + "/curated").count()

    n1 = stage("web_curation", n_pages, s1)

    # ---- stage 2: Gopher-rule gates + near-dup drop over stage 1 --------
    def s2():
        from pyspark import StorageLevel
        from pyspark.sql import Window

        from logport_spark.operators.dedup import minhash_lsh_pairs
        from logport_spark.operators.textstats import (lang_id, pii_scrub,
                                                       quality, repetition)

        docs = spark.read.parquet(OUT + "/curated").select("doc_id", "text")
        feats = pii_scrub(repetition(lang_id(quality(docs)))).select(
            "doc_id", F.md5("text").alias("text_md5"),
            "pred_lang", "quality_score",
            "top_token_frac", "dup_2gram_frac", "has_pii")
        w = Window.partitionBy("text_md5").orderBy("doc_id")
        d1meta = (feats.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn", "text_md5")
                  .persist(StorageLevel.MEMORY_AND_DISK))
        d1_docs = docs.join(d1meta.select("doc_id"), "doc_id", "left_semi")
        drops = minhash_lsh_pairs(d1_docs, n=3, threshold=0.8).select(
            F.col("d2").alias("doc_id")).distinct()
        kept = (d1meta.filter(
            (F.col("quality_score") >= 0.5) & (F.col("pred_lang") != "und")
            & ~F.col("has_pii") & (F.col("dup_2gram_frac") <= 0.5)
            & (F.col("top_token_frac") <= 0.3))
            .join(drops, "doc_id", "left_anti").select("doc_id"))
        (docs.join(kept, "doc_id", "left_semi")
         .write.mode("overwrite").parquet(OUT + "/clean"))
        d1meta.unpersist()
        return spark.read.parquet(OUT + "/clean").count()

    n2 = stage("corpus_clean_v2", n1, s2)

    # ---- stage 3: score → token budget (50% of corpus) → manifest -------
    def s3():
        from logport_spark.operators.sampling import (export_manifest,
                                                      select_token_budget)
        from logport_spark.operators.textstats import unigram_logprob

        docs = spark.read.parquet(OUT + "/clean")
        sc = unigram_logprob(docs).select(
            "doc_id", (-F.col("bits_per_token")).alias("score"),
            F.col("n_scored").alias("n_tokens")).persist()
        budget = int(sc.agg(F.sum("n_tokens")).first()[0] * 0.5)
        out["token_budget"] = budget
        kept_ids = (select_token_budget(sc, budget=budget)
                    .filter(F.col("selected")).select("doc_id"))
        kept = docs.join(kept_ids, "doc_id", "left_semi")
        (export_manifest(kept, n_shards=32)
         .write.mode("overwrite").parquet(OUT + "/manifest"))
        sc.unpersist()
        m = spark.read.parquet(OUT + "/manifest")
        out["export_docs"] = int(m.agg(F.sum("n_docs")).first()[0])
        return m.count()

    stage("training_export", n2, s3)

    out["peak_disk_bytes"] = peak
    out["total_sec"] = round(sum(s["sec"] for s in out["stages"].values()), 1)
    out["load_avg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
