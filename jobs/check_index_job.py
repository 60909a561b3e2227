"""spark-submit entry point: verify an on-disk SegmentIndex
(CheckIndex CLI role, ``index/CheckIndex.java:1``).

Usage:
    spark-submit --py-files dist/lucene_solr_spark.zip \\
        jobs/check_index_job.py --index /data/index

Prints one JSON report line; exit code 0 = clean, 1 = corrupt.
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.operators.check_index import check_index
    from lucene_solr_spark.operators.segments import SegmentIndex

    spark = SparkSession.builder.appName("check_index").getOrCreate()
    report = check_index(spark, SegmentIndex.open(args.index))
    print(json.dumps(report))
    return 0 if report["clean"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
