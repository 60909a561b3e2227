"""spark-submit entry point: full corpus deduplication pass.

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip jobs/dedup_job.py \\
        --input /data/documents.parquet --output /data/dedup \\
        [--text-col text] [--id-col doc_id] [--threshold 0.8] \\
        [--num-hashes 64] [--bands 32]

Pipeline (each stage's output written under --output):
  exact_groups/   — byte-identical groups (text_md5, n, keep_doc_id)
  near_pairs/     — MinHash-LSH candidates verified by exact Jaccard
  clusters/       — connected components of the pair graph
                    (doc_id, cluster_id = min reachable doc_id)
  survivors/      — doc ids that remain after keep-one-per-cluster
  stats.json      — corpus / group / drop counts

Scale shape: the corpus is scanned twice (signatures, final anti-join);
everything between runs over the pair list. No driver-side data loops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.functions.dedup import (
        connected_components,
        exact_duplicates,
        minhash_near_duplicates,
    )

    spark = SparkSession.builder.appName("dedup").getOrCreate()
    t0 = time.time()
    df = spark.read.parquet(args.input)
    n_docs = df.count()

    exact = exact_duplicates(df, text_col=args.text_col, id_col=args.id_col)
    exact.write.mode("overwrite").parquet(f"{args.output}/exact_groups")

    pairs = minhash_near_duplicates(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        threshold=args.threshold,
        num_hashes=args.num_hashes,
        bands=args.bands,
    ).select("doc_a", "doc_b")
    pairs = pairs.persist()
    n_pairs = pairs.count()
    pairs.write.mode("overwrite").parquet(f"{args.output}/near_pairs")

    clusters = connected_components(pairs, src_col="doc_a", dst_col="doc_b")
    clusters = clusters.persist()
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    drop = clusters.filter("doc_id != cluster_id").select(
        clusters["doc_id"].alias(args.id_col)
    )
    survivors = df.select(args.id_col).join(drop, args.id_col, "left_anti")
    survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    n_survivors = spark.read.parquet(f"{args.output}/survivors").count()

    stats = {
        "n_docs": n_docs,
        "n_exact_groups": exact.count(),
        "n_near_pairs": n_pairs,
        "n_clusters": clusters.select("cluster_id").distinct().count(),
        "n_survivors": n_survivors,
        "n_dropped": n_docs - n_survivors,
        "threshold": args.threshold,
        "sec": round(time.time() - t0, 3),
    }
    with open(f"{args.output}/stats.json", "w") as fh:
        json.dump(stats, fh)
    print(json.dumps(stats))
    pairs.unpersist()
    clusters.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
