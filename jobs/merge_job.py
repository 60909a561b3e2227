"""spark-submit entry point: run TieredMergePolicy merges over an index.

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip jobs/merge_job.py \\
        --index /data/index [--segs-per-tier 10] [--max-merged-gb 5]
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
    ap.add_argument("--segs-per-tier", type=float, default=10.0)
    ap.add_argument("--max-merge-at-once", type=int, default=10)
    ap.add_argument("--max-merged-gb", type=float, default=5.0)
    ap.add_argument("--floor-mb", type=float, default=2.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.operators.merge_policy import TieredMergePolicy, run_merges
    from lucene_solr_spark.operators.segments import SegmentIndex

    spark = SparkSession.getActiveSession()
    if spark is None:
        from lucene_solr_spark.session import get_spark

        spark = get_spark("merge_job")

    policy = TieredMergePolicy(
        segs_per_tier=args.segs_per_tier,
        max_merge_at_once=args.max_merge_at_once,
        max_merged_segment_bytes=int(args.max_merged_gb * 1024**3),
        floor_segment_bytes=int(args.floor_mb * 1024**2),
    )
    six = SegmentIndex.open(args.index)
    merged = run_merges(spark, six, policy)
    print(
        json.dumps(
            {
                "merged_segment_ids": merged,
                "n_segments_now": len(SegmentIndex.open(args.index).manifest()["segments"]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
