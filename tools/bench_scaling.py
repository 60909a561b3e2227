"""Scaling-efficiency harness: runs tools/scaling_workload.py at local[4]
and local[16] (fresh JVM per leg, same parquet input), ALTERNATING legs
over several repeats and keeping each leg's best (minimum) phase times —
the defensible measurement on a shared/noisy sandbox host. Writes
BENCH/BASELINE.md with throughput at both levels + N→4N efficiency.

Why 4 vs 16 (not 8 vs 32): the host advertises 32 CPUs but sustains
~85-90% of linear at full width (shared tenancy); the north rule asks for
efficiency between N and 4N *executors* — 4 vs 16 exercises that with
measurement headroom. Why per-phase: the sandbox's IO layer serializes
large writes, which would mask the compute stages' scaling on a real
cluster (where the write fans out across executors' disks/object store).

efficiency = (throughput@4N / throughput@N) / 4   (perfect scaling = 1.0)
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


def _wait_for_idle(max_load: float = 1.5, timeout_s: int = 600) -> tuple[float, bool]:
    """Hold a leg until the host's 1-min load drops below ``max_load``
    (or the timeout passes): the shared host's neighbors caused 2-7x
    spread between repeats of identical legs, which min-of-N cannot
    always filter. Gating on load keeps legs out of contention windows.

    Returns ``(load1_at_start, clean)`` — ``clean=False`` means the
    timeout expired and the leg ran under load anyway; the flag is
    recorded in the leg's JSON so tainted legs are identifiable."""
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while True:
        load1 = os.getloadavg()[0]
        if load1 < max_load:
            return load1, True
        if _time.monotonic() >= deadline:
            print(f"  [TIMEOUT: leg runs under load {load1:.1f}]", flush=True)
            return load1, False
        print(f"  [load {load1:.1f} >= {max_load}; waiting]", flush=True)
        _time.sleep(15)


def run(cores: int) -> dict:
    load1, clean = _wait_for_idle()
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
            leg = json.loads(line)
            # contention markers: start-of-leg 1-min load and whether the
            # idle gate was satisfied (False = timed out, leg may be
            # contention-tainted — visible in the raw JSON block)
            leg["load1_at_start"] = round(load1, 2)
            leg["idle_gate_clean"] = clean
            return leg
    raise RuntimeError(
        f"no JSON from cores={cores}: {out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> int:
    runs: dict[int, list[dict]] = {N: [], N4: []}
    for _ in range(REPEATS):
        for cores in (N, N4):
            runs[cores].append(run(cores))

    def best(cores: int, key: str) -> float:
        return min(r[key] for r in runs[cores])

    r_n = {k: best(N, k) for k in runs[N][0] if isinstance(runs[N][0][k], (int, float))}
    r_4n = {k: best(N4, k) for k in runs[N4][0] if isinstance(runs[N4][0][k], (int, float))}
    meta = runs[N][0]

    def eff(key_sec: str) -> float:
        return (r_n[key_sec] / r_4n[key_sec]) / 4.0

    e_invert = eff("invert_sec")
    e_encode = eff("encode_sec")
    e_encode_w = eff("encode_warm_sec")
    e_segments = eff("segments_sec")
    e_index = eff("index_sec")
    e_query = eff("query_sec")
    e_invert_w = eff("invert_warm_sec")
    e_segments_w = eff("segments_warm_sec")
    e_index_w = eff("index_warm_sec")

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")

    def row(name, key, e):
        return (
            f"| {name} (s) | {r_n[key]:.1f} | {r_4n[key]:.1f} | "
            f"{r_n[key]/r_4n[key]:.2f}x | {e:.3f} |"
        )

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Generated {stamp} by `tools/bench_scaling.py`.

Protocol: same job, same parquet input, two parallelism levels
(local[{N}] vs local[{N4}] = N vs 4N; fresh JVM per leg), legs ALTERNATED
over {REPEATS} repeats, best (min) time per leg/phase kept — the sandbox
proxy for the north rule's N→4N executor scaling (no real multi-node
cluster in this environment; the host is shared, so minima over
interleaved repeats estimate the uncontended cost).

Workload: deterministic synthetic source-code corpus
({meta["n_docs"]} docs, {meta["gb"]:.4f} GB content); index build split
into its two stages; ONE batched BM25 top-10 job over
{meta["n_queries"]} wikimedium-style queries (block-max kernel, float32).

| phase | local[{N}] | local[{N4}] | speedup | efficiency (speedup/4) |
|---|---|---|---|---|
{row("invert (tokenize+invert+norms+dict), cold", "invert_sec", e_invert)}
{row("invert, WARM workers (steady state)", "invert_warm_sec", e_invert_w)}
{row("segment encode COMPUTE (noop sink, no file IO), cold", "encode_sec", e_encode)}
{row("segment encode COMPUTE, WARM workers", "encode_warm_sec", e_encode_w)}
{row("segment encode+write, cold", "segments_sec", e_segments)}
{row("segment encode+write, WARM workers", "segments_warm_sec", e_segments_w)}
{row("index build total, cold", "index_sec", e_index)}
{row("index build total, WARM workers", "index_warm_sec", e_index_w)}
{row("batched query job", "query_sec", e_query)}

Throughputs (best legs): invert {r_n["invert_gb_per_hour"]:.2f} → {r_4n["invert_gb_per_hour"]:.2f} GB/h;
full index {r_n["index_gb_per_hour"]:.2f} → {r_4n["index_gb_per_hour"]:.2f} GB/h;
queries {r_n["qps"]:.1f} → {r_4n["qps"]:.1f} q/s.

North-rule criterion: efficiency ≥ 0.8 between N and 4N.
- invert stage, cold: **{e_invert:.3f}** — {"PASS" if e_invert >= 0.8 else "BELOW"}
- invert stage, warm workers (steady state on a long-lived cluster):
  **{e_invert_w:.3f}** — {"PASS" if e_invert_w >= 0.8 else "BELOW"}
- batched query job: **{e_query:.3f}** — {"PASS" if e_query >= 0.8 else "BELOW"}
- segment encode COMPUTE (noop sink), cold: **{e_encode:.3f}** — {"PASS" if e_encode >= 0.8 else "BELOW"}
- segment encode COMPUTE, warm: **{e_encode_w:.3f}** — {"PASS" if e_encode_w >= 0.8 else "BELOW"}
  (the round-3 verdict's asked-for split: the encode kernel's own
  scaling with the parquet write excluded; the encode shuffle is
  range-partitioned since the round-4 bucket-skew fix — see the probe
  study in the preserved round-4 run A section)
- segment encode+write, cold: **{e_segments:.3f}** — {"PASS" if e_segments >= 0.8 else "BELOW"} (sandbox IO-bound; on a
  real cluster this write fans out across executor disks / object store)
- segment encode+write, warm: **{e_segments_w:.3f}** — {"PASS" if e_segments_w >= 0.8 else "BELOW"}
- index build total, cold: **{e_index:.3f}** — {"PASS" if e_index >= 0.8 else "BELOW"}
- index build total, warm: **{e_index_w:.3f}** — {"PASS" if e_index_w >= 0.8 else "BELOW"}

The warm legs time the SAME build job run a second time in the same JVM
(fresh scratch + output dirs, full re-tokenize/re-encode/re-write): they
remove only the once-per-JVM costs — Python daemon forks, worker
imports, first-touch page faults through this sandbox kernel's
serialized fault path (see below) — which a long-lived cluster pays once
per executor lifetime, not per build.

Raw JSON (all legs):

```json
{os.linesep.join(json.dumps(r) for rs in runs.values() for r in rs)}
```
"""
    # preserve prior rounds' evidence across regenerations — everything
    # from the explicit <!-- PRESERVE-BELOW --> marker (fallback: the
    # first "# Prior evidence" heading) down; the old tables and noise
    # studies justify the protocol and must survive
    path = f"{REPO}/BENCH/BASELINE.md"
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        i = old.find("<!-- PRESERVE-BELOW -->")
        if i < 0:
            i = old.find("# Prior evidence")
        if i >= 0:
            tail = "\n\n---\n\n" + old[i:]
    with open(path, "w") as f:
        f.write(md + tail)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
