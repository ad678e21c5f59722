"""Chunked full-suite runner: execute tests/ in K separate pytest
processes (grouped by file, collection order preserved) and aggregate.

Why: late in r5 the single-process full suite started dying ~20-25 min
in — the session-scoped Spark JVM exits mid-run (py4j connection
refused; no hs_err, no OOM-killer trace), at varying, individually-green
test positions (three runs died at three different append_batch call
sites; every file passes in targeted runs, and an idle 40-min control
JVM survives). The pattern points at cumulative JVM-side load in one
long session, not at any single test. Until the root cause is pinned,
this runner bounds session lifetime the way a CI matrix would — each
chunk gets a fresh JVM — and writes one JSON artifact with per-chunk
results so a green full-surface run stays recordable.

Usage: python bench/run_suite.py [n_chunks] [out_json]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "SUITE_chunked.json")
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    chunks = [files[i::n_chunks] for i in range(n_chunks)]
    results, ok = [], True
    t0 = time.time()
    for i, chunk in enumerate(chunks):
        t1 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *chunk],
            cwd=REPO, capture_output=True, text=True)
        tail = "\n".join(r.stdout.splitlines()[-2:])
        results.append({
            "chunk": i,
            "files": [os.path.basename(f) for f in chunk],
            "returncode": r.returncode,
            "tail": tail,
            "wall_s": round(time.time() - t1, 1),
        })
        ok &= r.returncode == 0
        print(f"chunk {i}: rc={r.returncode} "
              f"({round(time.time() - t1)}s) {tail!r}", file=sys.stderr)
        # checkpoint after every chunk so a truncated run still leaves
        # a readable partial artifact
        summary = {"n_chunks": n_chunks, "all_green": ok,
                   "complete": i == n_chunks - 1,
                   "wall_s": round(time.time() - t0, 1),
                   "chunks": results}
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("n_chunks", "all_green", "wall_s")}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
