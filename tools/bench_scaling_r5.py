"""Round-5 scaling-evidence run (480k docs): re-measures the BATCHED
QUERY leg on shipped round-5 code (the round-3 0.862 number predates the
round-4/5 kernel changes) with the heavy-rewrite mix included (scored
prefix TOP_TERMS, constant-score OSA fuzzy, sloppy phrases — the paths
rounds 4/5 touched), and adds the MULTI-FIELD invert+encode legs (2-field
one-pass build, partitionBy(field) layout).

Protocol identical to tools/bench_scaling.py: same parquet input, fresh
JVM per leg, local[4] vs local[16], legs alternated over repeats, idle
gate + per-leg /proc/stat CPU fingerprints, min per phase. Raw legs →
BENCH/scaling_480k_r5.jsonl; summary table appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = "/root/repo"
N, N4 = 4, 16
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))

sys.path.insert(0, f"{REPO}/tools")
from bench_scaling import _wait_for_idle  # noqa: E402

RAW = f"{REPO}/BENCH/scaling_480k_r5.jsonl"


def run(cores: int) -> dict:
    load1, clean = _wait_for_idle()
    env = dict(
        os.environ,
        SCALING_DOCS="480000",
        SCALING_PHASES="segments,query,mfield",
        SCALING_HEAVY="1",
    )
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_workload.py", str(cores)],
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=REPO,
        env=env,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            leg = json.loads(line)
            leg["load1_at_start"] = round(load1, 2)
            leg["idle_gate_clean"] = clean
            with open(RAW, "a") as f:
                f.write(json.dumps(leg) + "\n")
            print(json.dumps(leg), flush=True)
            return leg
    raise RuntimeError(
        f"no JSON from cores={cores}: {out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> int:
    runs: dict[int, list[dict]] = {N: [], N4: []}
    for _ in range(REPEATS):
        for cores in (N, N4):
            runs[cores].append(run(cores))

    keys = (
        "invert_sec",
        "invert_warm_sec",
        "segments_sec",
        "segments_warm_sec",
        "query_sec",
        "mfield_invert_sec",
        "mfield_encode_sec",
    )

    def best(cores: int, key: str) -> float:
        return min(r[key] for r in runs[cores] if key in r)

    r_n = {k: best(N, k) for k in keys}
    r_4n = {k: best(N4, k) for k in keys}
    meta = runs[N][0]
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")

    def row(name: str, key: str) -> str:
        e = (r_n[key] / r_4n[key]) / 4.0
        return (
            f"| {name} (s) | {r_n[key]:.1f} | {r_4n[key]:.1f} | "
            f"{r_n[key] / r_4n[key]:.2f}x | {e:.3f} |"
        )

    qps_n = meta["n_queries"] / r_n["query_sec"]
    qps_4n = meta["n_queries"] / r_4n["query_sec"]
    md = f"""

---

# Round-5 re-evidence run ({stamp}, `BENCH/scaling_480k_r5.jsonl`)

Shipped round-5 HEAD; same 480k-doc corpus and protocol as the round-4
tables above (alternated legs, idle gate, per-leg CPU fingerprints, min
of {REPEATS} repeats per phase). The batched-query leg now carries the
HEAVY mix ({meta["n_queries"]} queries: terms/AND/OR/phrases PLUS scored
prefix TOP_TERMS(50), constant-score OSA fuzzy ed 1-2, and 2-term sloppy
phrases) — the dictionary-expansion and position-matcher kernel paths
rounds 4/5 changed, not just term/AND/OR. The multi-field legs build the
2-field (content + computed title) index in ONE corpus pass with the
partitionBy(field) layout, then encode BOTH fields (noop sink).

| phase | local[{N}] | local[{N4}] | speedup | efficiency (speedup/4) |
|---|---|---|---|---|
{row("invert, cold", "invert_sec")}
{row("invert, WARM workers", "invert_warm_sec")}
{row("segment encode+write, cold", "segments_sec")}
{row("segment encode+write, WARM", "segments_warm_sec")}
{row("batched query job (HEAVY mix)", "query_sec")}
{row("MULTI-FIELD invert (2 fields, one pass)", "mfield_invert_sec")}
{row("MULTI-FIELD encode x2 (noop sink)", "mfield_encode_sec")}

Batched query throughput: {qps_n:.1f} q/s at local[{N}] →
{qps_4n:.1f} q/s at local[{N4}].
"""
    with open(f"{REPO}/BENCH/BASELINE.md", "a") as f:
        f.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
