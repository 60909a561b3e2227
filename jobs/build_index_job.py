"""spark-submit entry point: corpus parquet → encoded segment index.

Usage (cluster):
    python tools/make_pyfiles_zip.py   # → dist/lucene_solr_spark.zip
    spark-submit --py-files dist/lucene_solr_spark.zip \\
        jobs/build_index_job.py --input /data/corpus --output /data/index \\
        [--text-col content] [--segment-size 65536] [--resume]

Local smoke: python jobs/build_index_job.py --input ... --output ...
(the session factory falls back to local[$SPARK_GRAFT_CPUS]).

The job is idempotent/checkpoint-resumable: with --resume, segments whose
manifest rows exist are skipped (operators.segments).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet path")
    ap.add_argument("--output", required=True, help="segment index base dir")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default=None, help="trust an existing id column")
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--segment-size", type=int, default=1 << 16)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import build_segments

    spark = SparkSession.getActiveSession()
    if spark is None:
        from lucene_solr_spark.session import get_spark

        spark = get_spark("build_index_job")

    corpus = spark.read.parquet(args.input)
    ix = build_index(
        corpus,
        text_col=args.text_col,
        doc_id_col=args.doc_id_col,
        key_cols=tuple(args.key_cols.split(",")),
        with_positions=not args.no_positions,
    )
    six = build_segments(
        ix, args.output, segment_size=args.segment_size, resume=args.resume
    )
    m = six.manifest()
    print(
        json.dumps(
            {
                "doc_count": m["doc_count"],
                "sum_ttf": m["sum_ttf"],
                "n_segments": len(m["segments"]),
                "manifest_sha256": m["manifest_sha256"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
