"""N vs 4N scaling protocol (BASELINE.md): run bench.py at local[8] and
local[32] on the SAME deterministic input, report throughput at both plus
scaling efficiency, write BENCH/BASELINE.md + BENCH/baseline.json.

Usage: python bench/run_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_convs: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_CONVS=str(n_convs),
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (8, 32):
        print(f"=== bench at local[{cpus}] ===", file=sys.stderr)
        results[cpus] = run(cpus, n_convs, sf_dir)
    thr8 = results[8]["queries"]["build_turns_per_sec"]
    thr32 = results[32]["queries"]["build_turns_per_sec"]
    eff = (thr32 / thr8) / 4.0
    p50_8 = results[8]["queries"]["query_p50"]
    p50_32 = results[32]["queries"]["query_p50"]
    summary = {
        "n_convs": n_convs,
        "n_turns": results[32]["n_turns"],
        "build_turns_per_sec": {"local8": thr8, "local32": thr32},
        "query_p50_s": {"local8": p50_8, "local32": p50_32},
        "scaling_efficiency_N_to_4N": round(eff, 4),
        "target": 0.8,
        "runs": results,
    }
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/baseline.json", "w") as f:
        json.dump(summary, f, indent=1)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — measured baseline (this repo)

Protocol per BASELINE.md: same deterministic input (FIXTURES.md seed=42,
{n_convs} convs = {results[32]['n_turns']} turns), same code/configs, only
the master string differs (sandbox substitution for N vs 4N executors).

| metric | local[8] (N) | local[32] (4N) |
| --- | --- | --- |
| index build throughput (turns/sec) | {thr8} | {thr32} |
| index build wall (s) | {results[8]['queries']['index_build']} | {results[32]['queries']['index_build']} |
| BM25 top-10 query latency p50 (s) | {p50_8} | {p50_32} |

**Scaling efficiency N->4N = (thr@4N / thr@N) / 4 = {eff:.3f}** (target >= 0.8)

Full per-query timings in `BENCH/baseline.json`.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
