"""Scaling-efficiency harness: runs tools/scaling_workload.py at local[8]
and local[32] (fresh JVM each, same parquet input) and writes
BENCH/BASELINE.md with throughput at both levels + efficiency — the
sandbox evidence for the north rule's ">=0.8 scaling from N to 4N
executors" criterion (no real multi-node cluster available here).

efficiency = (throughput@32 / throughput@8) / 4  (perfect scaling = 1.0)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = "/root/repo"


def run(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_workload.py", str(cores)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from cores={cores}: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    r8 = run(8)
    r32 = run(32)
    ix_eff = (r32["index_gb_per_hour"] / r8["index_gb_per_hour"]) / 4.0
    q_eff = (r32["qps"] / r8["qps"]) / 4.0
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Generated {stamp} by `tools/bench_scaling.py` (same job, same parquet
input, two parallelism levels — the sandbox proxy for the north rule's
N→4N executor scaling; no real cluster in this environment).

Workload: deterministic synthetic source-code corpus
({r8["n_docs"]} docs, {r8["gb"]:.4f} GB content), full index build
(tokenize → postings/norms/dictionary → encoded doc-range segments) +
one batched BM25 top-10 job over {r8["n_queries"]} wikimedium-style
queries (block-max kernel, float32).

| metric | local[8] | local[32] | ratio | efficiency (ratio/4) |
|---|---|---|---|---|
| index build (s) | {r8["index_sec"]:.1f} | {r32["index_sec"]:.1f} | {r8["index_sec"]/r32["index_sec"]:.2f}x | {ix_eff:.3f} |
| index GB/hour | {r8["index_gb_per_hour"]:.3f} | {r32["index_gb_per_hour"]:.3f} | {r32["index_gb_per_hour"]/r8["index_gb_per_hour"]:.2f}x | {ix_eff:.3f} |
| query batch (s) | {r8["query_sec"]:.1f} | {r32["query_sec"]:.1f} | {r8["query_sec"]/r32["query_sec"]:.2f}x | {q_eff:.3f} |
| queries/sec | {r8["qps"]:.2f} | {r32["qps"]:.2f} | {r32["qps"]/r8["qps"]:.2f}x | {q_eff:.3f} |

North-rule criterion: efficiency >= 0.8 between N and 4N.
Index-build efficiency: **{ix_eff:.3f}** — {"PASS" if ix_eff >= 0.8 else "BELOW"}.
Query-throughput efficiency: **{q_eff:.3f}** — {"PASS" if q_eff >= 0.8 else "BELOW"}.

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```

Notes:
- local[N] shares one JVM/driver; true multi-executor deployments remove
  the shared-driver bottlenecks (GIL-free JVM stages dominate here).
- the corpus parquet is generated once (seed 42, distributed generator in
  sources/corpus.corpus_distributed) and reused by both runs.
"""
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
