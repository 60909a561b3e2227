#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two timed phases, mirroring BASELINE.md's protocol:
  1. index build — corpus scan → tokenize → postings/norms/term-stats,
     materialized (GB/hour derived from the content byte volume);
  2. ranked retrieval — the headline BM25/boolean/phrase/dedup/ANN query
     set from ``__spark_entry__.queries()``, each timed to completion.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
``tools/bench_scaling.py``, which shells out to this file at two
parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline query subset (each key must exist in __spark_entry__.queries()).
HEADLINE = [
    "term_topk",
    "term_topk_head",
    "and2_topk",
    "and3_topk",
    "or2_topk",
    "req_opt_topk",
    "dismax_topk",
    "synonym_topk",
    "msm2_set",
    "phrase_freq",
    "prefix_set",
    "term_stats_all",
    "dedup_exact",
    "token_stats",
    "quality_score",
    "ann_cosine_topk",
    "events_window",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod
    from lucene_solr_spark.session import get_spark

    spark = get_spark("bench", cores=cores)

    # ---- phase 1: index build (GB/hour) --------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    content_bytes = docs.selectExpr(
        "sum(octet_length(text)) AS b"
    ).collect()[0]["b"]
    gb = (content_bytes or 0) / 1e9

    t0 = time.perf_counter()
    ex = entry_mod._executor(spark, sf_dir)  # builds + persists the index
    # materialize every index table so build cost is fully inside this timer
    ex.index.postings.count()
    ex.index.docs.count()
    ex.index.term_stats.count()
    index_sec = time.perf_counter() - t0
    gb_per_hour = gb / (index_sec / 3600.0) if index_sec > 0 else 0.0

    # ---- phase 2: query set --------------------------------------------
    qs = entry_mod.queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        per_query[name] = round(time.perf_counter() - t, 4)

    query_sec = sum(per_query.values())
    total = index_sec + query_sec
    qps = len(per_query) / query_sec if query_sec > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "index_build_plus_headline_queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "index_build_sec": round(index_sec, 3),
                "index_gb": round(gb, 6),
                "index_gb_per_hour": round(gb_per_hour, 3),
                "query_sec": round(query_sec, 3),
                "queries_per_sec": round(qps, 3),
                "cores": cores,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
