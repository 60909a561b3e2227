"""spark-submit entry point: build a materialized ANN index over an
embedding table (LSH multi-table, IVF inverted lists, or IVFPQ codes).

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip jobs/ann_index_job.py \\
        --input /data/embeddings.parquet --output /data/ann_index \\
        --kind ivfpq [--n-lists 1024] [--m 8] [--nbits 8] \\
        [--n-tables 8] [--n-planes 16] \\
        [--id-col vec_id] [--emb-col embedding] [--sample-fraction 0.1]

Layouts (all partition-pruned at query time):
  lsh   — hyperplane signatures, one partition per (table, sig)
  ivf   — k-means inverted lists, one partition per list_id
  ivfpq — IVF lists + PQ codes (m bytes/vector) for ADC scoring
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--kind", choices=("lsh", "ivf", "ivfpq"), default="ivf")
    ap.add_argument("--n-lists", type=int, default=1024)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--nbits", type=int, default=8)
    ap.add_argument("--n-tables", type=int, default=8)
    ap.add_argument("--n-planes", type=int, default=16)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--emb-col", default="embedding")
    ap.add_argument("--sample-fraction", type=float, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ann_index_build").getOrCreate()
    df = spark.read.parquet(args.input)

    if args.kind == "lsh":
        from lucene_solr_spark.functions.similarity import write_ann_index

        write_ann_index(
            df,
            args.output,
            n_tables=args.n_tables,
            n_planes=args.n_planes,
            id_col=args.id_col,
            emb_col=args.emb_col,
            seed=args.seed,
        )
        meta = {"kind": "lsh", "n_tables": args.n_tables, "n_planes": args.n_planes}
    elif args.kind == "ivf":
        from lucene_solr_spark.functions.similarity import write_ivf_index

        cents = write_ivf_index(
            df,
            args.output,
            args.n_lists,
            id_col=args.id_col,
            emb_col=args.emb_col,
            seed=args.seed,
            sample_fraction=args.sample_fraction,
        )
        meta = {"kind": "ivf", "n_lists": int(len(cents))}
    else:
        from lucene_solr_spark.functions.pq import write_ivfpq_index

        cents, books = write_ivfpq_index(
            df,
            args.output,
            n_lists=args.n_lists,
            m=args.m,
            nbits=args.nbits,
            id_col=args.id_col,
            emb_col=args.emb_col,
            seed=args.seed,
            sample_fraction=args.sample_fraction,
        )
        meta = {
            "kind": "ivfpq",
            "n_lists": int(len(cents)),
            "m": int(books.shape[0]),
            "ksub": int(books.shape[1]),
        }

    print(json.dumps({"status": "ok", "output": args.output, **meta}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
