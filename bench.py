#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line to stdout:
    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Modes:
    python bench.py             # per-round driver bench (one parallelism level)
    python bench.py --scaling   # north_rule evidence: same input at local[8]
                                # vs local[32]; writes BENCH section results
                                # (pages/sec x2 + scaling efficiency) into the
                                # JSON extras and BENCH/BASELINE.md

Each query is forced end-to-end with a noop sink (full evaluation, no
driver-side collect bottleneck). The flagship `lp_pipeline` measures the
whole parse→enrich→route→aggregate DAG over the synthetic pages table at the
matching scale factor (SURVEY.md §7 P7).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    """Fully evaluate df; return row count (cheap: count() after noop warms)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _headline_queries():
    """name → (spark, sf_dir) -> DataFrame; subset of __spark_entry__.queries()
    that exercises scan/parse/join/agg at bench scale, plus heavy extras."""
    import __spark_entry__ as em

    qs = em.queries()
    names = [
        "lp_envelope",          # parse hot path end-to-end (UDF-bound)
        "lp_sink_metrics",      # + route + aggregate
        "q1_pricing_summary",   # scan+filter+agg on lineitem
        "events_hourly",        # time-bucketed agg
    ]
    for opt in (
        "lp_grok_summary", "lp_http_batches", "lp_resume_anti_join",
        "dedup_exact", "dedup_minhash_pairs", "dedup_simhash_pairs",
        "text_quality", "doc_fingerprint", "ann_topk", "ann_lsh_topk",
    ):
        if opt in qs:
            names.append(opt)
    return {n: qs[n] for n in names if n in qs}


def run_suite(spark, sf_dir: str) -> tuple[dict, dict]:
    queries = _headline_queries()
    timings: dict[str, float] = {}
    extras: dict = {}
    for name, fn in queries.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        _force(df)
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    return timings, extras


def pipeline_throughput(spark, sf: str) -> tuple[float, int, int]:
    """(seconds, n_pages, n_records) for the full parse→route→metrics DAG."""
    from logport_spark import datagen
    from logport_spark.plans.pipeline import parsed_routed, sink_metrics

    path = datagen.ensure_pages(sf, spark=spark)
    pages = spark.read.parquet(path)
    n_pages = pages.count()
    t0 = time.time()
    metrics = sink_metrics(parsed_routed(spark, pages)).collect()
    dt = time.time() - t0
    n_records = sum(r["rows_routed"] for r in metrics)
    return dt, n_pages, n_records


def scaling_run(sf: str) -> dict:
    """north_rule: same job, same input, local[8] vs local[32]."""
    from logport_spark.session import get_spark

    out = {}
    for cpus in (8, 32):
        spark = get_spark(f"bench_scaling_{cpus}", cpus=cpus,
                          shuffle_partitions=max(cpus, 8))
        # warm the JVM + generate pages before timing
        dt, n_pages, n_rec = pipeline_throughput(spark, sf)
        dt2, _, _ = pipeline_throughput(spark, sf)  # second run, JIT-warm
        best = min(dt, dt2)
        out[f"local[{cpus}]"] = {
            "sec": round(best, 2),
            "pages_per_sec": round(n_pages / best, 1),
            "records_per_sec": round(n_rec / best, 1),
        }
        spark.stop()
        print(f"  scaling local[{cpus}]: {best:.2f}s "
              f"{n_pages/best:.0f} pages/s", file=sys.stderr)
    t8 = out["local[8]"]["pages_per_sec"]
    t32 = out["local[32]"]["pages_per_sec"]
    out["scaling_efficiency"] = round(t32 / (4 * t8), 3)
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"

    from logport_spark.session import get_spark

    extras: dict = {}
    if scaling:
        extras["scaling"] = scaling_run(sf)

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=max(CPUS, 8))
    # pages table at bench scale (generated once, cached on disk)
    from logport_spark import datagen
    datagen.ensure_pages(sf, spark=spark)
    datagen.ensure_lookups()

    # flagship throughput
    dt, n_pages, n_records = pipeline_throughput(spark, sf)
    extras["pages_per_sec"] = round(n_pages / dt, 1)
    extras["records_per_sec"] = round(n_records / dt, 1)
    extras["n_pages"] = n_pages
    extras["n_records"] = n_records
    timings, _ = run_suite(spark, SF_DIR)
    timings["lp_pipeline"] = round(dt, 3)
    total = round(sum(timings.values()), 3)

    result = {
        "metric": "parse_route_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        **extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
