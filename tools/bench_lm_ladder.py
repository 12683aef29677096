"""Quiet-box re-measure of the lm_bits 5M ladder point (r4 verdict #3).

The r4 artifact recorded 60.8k docs/s at load_avg_end 27.7 vs r3's 143.8k
— this run decides whether the distinct-token pre-agg
(textstats.unigram_logprob: the (doc_id, tok) count BEFORE the token
shuffle) actually costs on the ladder's uniform corpus, or the r4 number
was ambient. Measures BOTH paths best-of-2 on the same 5M-doc table:

  * lm_bits          — the shipped operator (per-doc distinct tokens cross
                       the token shuffle, count-weighted mean)
  * lm_bits_peroccur — the r3 shape (every occurrence crosses the shuffle)

Run: python tools/bench_lm_ladder.py   (prints one JSON line; numbers land
in BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from logport_spark import datagen  # noqa: E402
from logport_spark.session import get_spark  # noqa: E402

N = 5_000_000


def per_occurrence_logprob(docs):
    """r3's unigram_logprob shape: occurrences (not per-doc distinct
    counts) are the token-keyed join input — the comparison arm (now the
    operator's distinct_preagg=False branch)."""
    from logport_spark.operators.textstats import unigram_logprob

    return unigram_logprob(docs, distinct_preagg=False)


def main() -> None:
    from logport_spark.operators.textstats import unigram_logprob

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_lm_ladder", cpus=cpus,
                      shuffle_partitions=cpus)
    out: dict = {"n": N, "load_avg_start": round(os.getloadavg()[0], 2)}

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # untimed warm-up at 5k (JIT + Arrow spin-up)
    warm = spark.read.parquet(
        datagen.ensure_documents(5_000, spark) + "/documents.parquet")
    force(unigram_logprob(warm))
    force(per_occurrence_logprob(warm))
    spark.catalog.clearCache()

    t0 = time.time()
    path = datagen.ensure_documents(N, spark, embeddings=False)
    out["gen_sec"] = round(time.time() - t0, 1)
    docs = spark.read.parquet(path + "/documents.parquet")

    for name, fn in (("lm_bits_distinct", unigram_logprob),
                     ("lm_bits_peroccur", per_occurrence_logprob)):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(fn(docs))
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        out[name + "_sec"] = round(best, 1)
        out[name + "_docs_per_sec"] = round(N / best, 1)
        print(f"  {name}: {best:.1f}s ({N / best:,.0f} docs/s)",
              file=sys.stderr)

    out["load_avg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
