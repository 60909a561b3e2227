"""Diagnostic probe: is the encode stage's residual scaling gap the
shuffle's local-disk file IO (the sandbox serializes file writes) or the
encode kernel itself?

Runs the encode-COMPUTE leg (encode_frame → noop sink, zero output IO)
at a given core count twice (cold + warm) under two shuffle storages:
  disk  — default spark.local.dir (the main harness condition)
  tmpfs — spark.local.dir on /dev/shm (RAM-backed: shuffle file IO
          removed from the picture; what a real cluster's per-executor
          NVMe/page-cache behaves like)

If tmpfs lifts the 16-core leg but not the 4-core leg, the gap is the
serialized shuffle-file path, not kernel compute — the evidence the
round-3 verdict asked for. Prints one JSON line per (storage, run).

Usage: python tools/encode_shuffle_probe.py <cores> [n_docs]
Fresh JVM per storage condition (separate invocations recommended for
clean page caches): the script itself runs ONE storage per process —
pass 'disk' or 'tmpfs' as argv[2].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    cores = int(sys.argv[1])
    storage = sys.argv[2] if len(sys.argv) > 2 else "disk"
    n_docs = int(os.environ.get("SCALING_DOCS", "120000"))
    corpus_dir = os.environ.get("SCALING_CORPUS", f"/tmp/scaling_corpus_{n_docs}")

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import encode_frame
    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.sources.corpus import corpus_distributed

    extra = {}
    if storage == "tmpfs":
        d = f"/dev/shm/spark_probe_{cores}"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(f"encode_probe_{storage}_{cores}", cores=cores, extra_conf=extra)

    if not os.path.exists(f"{corpus_dir}/_SUCCESS"):
        corpus_distributed(spark, n_docs, seed=42, num_partitions=128).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    ix = build_index(corpus)  # untimed: just the encode input
    ix.docs.count()

    times = []
    for _ in range(2):  # cold, warm
        t0 = time.perf_counter()
        encode_frame(ix, 1 << 11).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))

    print(
        json.dumps(
            {
                "cores": cores,
                "storage": storage,
                "n_docs": n_docs,
                "encode_cold_sec": times[0],
                "encode_warm_sec": times[1],
                "load1": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()
    if storage == "tmpfs":
        import shutil

        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
