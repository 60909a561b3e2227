"""Big-corpus (480k-doc) scaling legs for the COMPUTE stages only:
invert and segment-encode (noop sink). Purpose: the 120k-doc legs carry
a per-task fixed cost (Python worker handshake + Arrow batch setup +
the range-partition sampler job) that is ~constant while the per-leg
work shrinks 4x at 4x cores — the same artifact that put the batched
query leg at 0.374 at 120k docs vs 0.862 PASS at 480k. This harness
reproduces that diagnosis for the encode-compute leg: same job, 4x the
input, local[4] vs local[16], alternated repeats, min per leg.

Writes raw legs to BENCH/scaling_480k_r4.jsonl and prints the table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = "/root/repo"
N, N4 = 4, 16
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))

sys.path.insert(0, f"{REPO}/tools")
from bench_scaling import _wait_for_idle  # noqa: E402


def run(cores: int) -> dict:
    load1, clean = _wait_for_idle()
    env = dict(
        os.environ,
        SCALING_DOCS="480000",
        SCALING_PHASES="invert,encode",
    )
    out = subprocess.run(
        [sys.executable, f"{REPO}/tools/scaling_workload.py", str(cores)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
        env=env,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            leg = json.loads(line)
            leg["load1_at_start"] = round(load1, 2)
            leg["idle_gate_clean"] = clean
            with open(f"{REPO}/BENCH/scaling_480k_r4.jsonl", "a") as f:
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

    def best(cores: int, key: str) -> float:
        return min(r[key] for r in runs[cores])

    print("\nphase | local[4] | local[16] | speedup | efficiency")
    for key in ("invert_sec", "invert_warm_sec", "encode_sec", "encode_warm_sec"):
        a, b = best(N, key), best(N4, key)
        print(f"{key} | {a:.1f} | {b:.1f} | {a/b:.2f}x | {(a/b)/4:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
