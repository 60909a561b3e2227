"""SparkSession factory tuned for the sandbox (local[N]) while keeping the
settings that matter on a real multi-executor cluster (AQE, skew join,
Arrow batch size). On a 1000-executor cluster the same builder applies —
only master/memory change."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


# Allocation tuning for kernels with slow 4K anonymous page faults (this
# sandbox faults plain pages at ~6-40 MB/s). Huge mmap/trim thresholds
# keep big blocks in the heap, so every allocation after the first
# reuses warm pages. Harmless on healthy hosts.
# (THP variants were tried and REJECTED: glibc.malloc.hugetlb=1 and
# -XX:+UseTransparentHugePages are 2500x faster single-process, but
# under 16 concurrent workers this kernel's THP compaction stalls made
# the same job 10x SLOWER — measured, not assumed.)
# Set in the driver env BEFORE the JVM spawns (python workers inherit),
# and exported via executorEnv for real clusters.
_MALLOC_TUNING = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}


def get_spark(
    app_name: str = "lucene_solr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    for k, v in _MALLOC_TUNING.items():
        os.environ.setdefault(k, v)  # driver + forked python workers
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 512-row Arrow batches: measured sweet spot on this host — large
        # enough to amortize the Arrow bridge and the vectorized-tokenizer
        # setup, small enough that each batch's numpy temporaries are
        # served from the warmed allocator heap instead of fresh mmap'd
        # pages (anonymous page faults run ~20-40 MB/s on this kernel; a
        # 4096-row batch paid ~140 s of first-touch across 16 workers,
        # a 512-row batch ~4 s). See _MALLOC_TUNING.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # Finer scan splits than the 128MB/4MB cluster defaults: medium
        # corpora (0.5-3 GB) otherwise read as ~1 wave of tasks, and one
        # straggler wave idles most of the cluster (measured: a 1.8 GB
        # corpus read as 19 tasks ran invert at 23% CPU on 16 cores —
        # the 16+3 wave tail). 32MB splits keep the scan-fused tokenize
        # stage at >= 2 waves on medium corpora without paying per-task
        # overhead on every scan (16MB was tried: the extra tasks bought
        # nothing the leg noise could resolve). At web scale the split
        # count is bounded by row groups, not this knob. 1MB open cost
        # stops many-file scratch dirs from bin-packing back into a
        # handful of coarse tasks.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.python.worker.reuse", "true")
        # FAIR job scheduling: concurrent driver threads (e.g. the merge
        # scheduler's build phase) share executor slots round-robin
        # instead of head-of-line FIFO blocking
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in _MALLOC_TUNING.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
