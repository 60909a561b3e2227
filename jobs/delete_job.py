"""spark-submit entry point: tombstone-delete documents from an index.

The IndexWriter.deleteDocuments surface as a batch job
(``operators/deletes.py``): deletes land in the tombstone table and are
masked from every search immediately; space and statistics are
reclaimed by the next merge (run ``jobs/merge_job.py``).

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip jobs/delete_job.py \\
        --index /data/index --query 'spam AND "buy now"'
    spark-submit ... jobs/delete_job.py \\
        --index /data/index --ids-parquet /data/near_dup_doc_ids
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--query", help="classic query syntax; matches are deleted")
    g.add_argument(
        "--ids-parquet",
        help="parquet of doc_id to delete (the distributed bulk-dedup path)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.operators.deletes import (
        delete_by_ids_df,
        delete_by_query,
    )
    from lucene_solr_spark.operators.segments import SegmentIndex

    spark = SparkSession.getActiveSession()
    if spark is None:
        from lucene_solr_spark.session import get_spark

        spark = get_spark("delete_job")

    index = SegmentIndex.open(args.index)
    if args.query is not None:
        from lucene_solr_spark.plans.parser import parse_query

        n = delete_by_query(spark, index, parse_query(args.query))
    else:
        ids = spark.read.parquet(args.ids_parquet).select("doc_id")
        n = delete_by_ids_df(index, ids)

    print(json.dumps({"index": args.index, "tombstones_total": int(n)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
