"""spark-submit entry point: NRT streaming indexer (Structured Streaming).

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip jobs/nrt_index_job.py \\
        --source /data/incoming --index /data/index --checkpoint /data/ckpt \\
        [--continuous] [--merge-after-batch]

Each micro-batch becomes one immutable appended segment + an atomic
manifest commit (streaming.nrt); searchers reopen by re-reading the
manifest. --continuous keeps micro-batching; default drains available
files and stops (availableNow).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="parquet dir watched as a stream")
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--merge-after-batch", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.streaming.nrt import index_stream

    spark = SparkSession.getActiveSession()
    if spark is None:
        from lucene_solr_spark.session import get_spark

        spark = get_spark("nrt_index_job")

    schema = spark.read.parquet(args.source).schema
    stream = spark.readStream.schema(schema).parquet(args.source)
    q = index_stream(
        stream,
        args.index,
        args.checkpoint,
        text_col=args.text_col,
        key_cols=tuple(args.key_cols.split(",")),
        trigger_once=not args.continuous,
        merge_after_batch=args.merge_after_batch,
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
