"""Percolator (monitor) scaling evidence: Monitor.match over the shared
480k-doc scaling corpus at two parallelism levels — the N vs 4N proxy
for the new reverse-search operator.

One leg = register a fixed 60-query monitor (terms / ANDs / ORs /
phrases / NOTs over deterministic mid-frequency dictionary terms —
realistic selective alert queries), run ``match`` end-to-end (presearch broadcast join +
batch-kernel verify), COLD then WARM (same JVM, workers warm).  Legs
alternate 4/16 cores, best-of per side, with the per-leg CPU
fingerprints of the round-4 instrument.

Usage:  python tools/bench_monitor_scaling.py [repeats]
Appends JSON lines to BENCH/scaling_monitor_r5.jsonl; EXCLUSIVE run
(nothing else on the host), same contract as the other scaling tools.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
RAW = f"{REPO}/BENCH/scaling_monitor_r5.jsonl"

_LEG_SRC = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from tools.scaling_workload import _cpu_sample, _cpu_shares

cores = int(sys.argv[1])
n_docs = int(os.environ.get("SCALING_DOCS", "480000"))
corpus_dir = os.environ.get("SCALING_CORPUS", f"/tmp/scaling_corpus_{n_docs}")

from pyspark.sql import functions as F
from lucene_solr_spark.operators.monitor import Monitor
from lucene_solr_spark.plans import ir
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.sources.corpus import corpus_distributed

spark = get_spark(f"monitor_scaling_{cores}", cores=cores)
if not os.path.exists(f"{corpus_dir}/_SUCCESS"):
    corpus_distributed(spark, n_docs, seed=42, num_partitions=128).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
docs = (
    spark.read.parquet(corpus_dir)
    .selectExpr("monotonically_increasing_id() AS doc_id", "content AS text")
)
gb = (docs.selectExpr("sum(octet_length(text)) AS b").collect()[0]["b"] or 0) / 1e9

# deterministic 60-query registration
from lucene_solr_spark.functions.analysis import postings_frame
# mid-frequency vocabulary: realistic alert queries are selective —
# ranks 100-160 of the sample dictionary, not the Zipf head
ranked = [
    r.term
    for r in postings_frame(docs.limit(4000), text_col="text", id_col="doc_id",
                            with_positions=False)
    .groupBy("term").count().orderBy(F.desc("count"), F.asc("term"))
    .limit(160).collect()
]
head = ranked[100:140] if len(ranked) >= 140 else ranked[-40:]
_T, _C, _O = ir.TermQuery, ir.BooleanClause, ir.Occur
# SELECTIVE registration (alerts, not analytics): conjunctions,
# phrases and exclusions only — percolation output is rare hits, so the
# leg measures presearch + verify compute, not 10M-row emission
qs = {}
for i in range(20):
    a, b = head[i], head[(i + 13) % len(head)]
    c = head[(i + 7) % len(head)]
    qs[f"and{i}"] = ir.BooleanQuery((_C(_O.MUST, _T(a)), _C(_O.MUST, _T(b)), _C(_O.MUST, _T(c))))
    qs[f"ph{i}"] = ir.PhraseQuery((a, b))
    qs[f"not{i}"] = ir.BooleanQuery(
        (_C(_O.MUST, _T(a)), _C(_O.MUST, _T(b)), _C(_O.MUST_NOT, _T(c)))
    )
mon = Monitor(qs)

t0 = time.perf_counter()
n_cold = mon.match(docs).count()
cold_sec = time.perf_counter() - t0

cpu0 = _cpu_sample()
t0 = time.perf_counter()
n_warm = mon.match(docs).count()
warm_sec = time.perf_counter() - t0
cpu = _cpu_shares(cpu0, _cpu_sample())

print("LEGRESULT " + json.dumps({
    "cores": cores, "n_docs": n_docs, "gb": round(gb, 6),
    "n_queries": len(qs), "matches": int(n_warm),
    "monitor_cold_sec": round(cold_sec, 3),
    "monitor_warm_sec": round(warm_sec, 3),
    "monitor_warm_gb_per_hour": round(gb / (warm_sec / 3600.0), 3),
    "monitor_warm_cpu": cpu,
    "load1_at_start": round(os.getloadavg()[0], 2),
}))
"""


def _leg(cores: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _LEG_SRC, str(cores)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(
        f"leg {cores} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    best: dict[int, dict] = {}
    with open(RAW, "a") as f:
        for _ in range(repeats):
            for cores in (4, 16):  # alternate
                r = _leg(cores)
                print(json.dumps(r), flush=True)
                f.write(json.dumps(r) + "\n")
                cur = best.get(cores)
                if cur is None or r["monitor_warm_sec"] < cur["monitor_warm_sec"]:
                    best[cores] = r
    if 4 in best and 16 in best:
        s4, s16 = best[4]["monitor_warm_sec"], best[16]["monitor_warm_sec"]
        eff = (s4 / s16) / 4.0
        print(
            json.dumps(
                {
                    "summary": "monitor match warm best-of",
                    "local4_sec": s4,
                    "local16_sec": s16,
                    "speedup": round(s4 / s16, 2),
                    "efficiency": round(eff, 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
