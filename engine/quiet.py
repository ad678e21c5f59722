"""Ambient-load guard shared by bench.py and bench/run_scaling.py.

VERDICT r4 #1: the official BENCH_r04 artifact recorded a 2.4x-inflated
index build because the wait-for-quiet guard lived only in
bench/run_scaling.py — bench.py (the driver's entry point) ran its build
rows single-shot and unguarded, and the capture landed in a co-tenant
load window. This module centralizes the guard so both entry points use
the same logic and every timed build row records the ambient load it
actually started under.

Two signals, because they fail differently on a shared box:

- ``loadavg()`` — the 1-min load average. Right for BETWEEN-process
  waits (run_scaling launches each bench level as a fresh subprocess,
  so by wait time its own load has exited the average). Wrong for
  IN-process waits: the bench's own just-finished 32-thread stage
  keeps the average high for ~a minute after the box is actually idle,
  so a loadavg gate would stall every row behind the bench's own wake.
- ``cpu_busy()`` — instantaneous whole-box CPU busy fraction from two
  /proc/stat samples. The caller is sleeping during the window and the
  idle Spark session contributes only stray GC ticks, so the reading
  is effectively the CO-TENANT load right now — the thing that would
  contaminate the next timed row.

Interference only ever slows a run, so the full protocol is
wait-for-quiet + best-of-N with min-wins (the guard bounds the common
case; min-wins is the backstop when ambient load never settles within
the wait cap).
"""

from __future__ import annotations

import os
import time


def loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return 0.0


def cpu_busy(window: float = 1.0) -> float:
    """Whole-box CPU busy fraction over ``window`` seconds (0.0-1.0),
    from two /proc/stat aggregate samples. Returns 0.0 where /proc is
    unavailable (non-Linux), which disables the gate rather than
    stalling."""

    def sample():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle+iowait
        return idle, sum(vals)

    try:
        i0, t0 = sample()
        time.sleep(window)
        i1, t1 = sample()
        dt = t1 - t0
        return 0.0 if dt <= 0 else max(0.0, 1.0 - (i1 - i0) / dt)
    except Exception:
        return 0.0


def wait_quiet_busy(busy_thresh: float | None = None,
                    max_wait_s: int | None = None,
                    poll_s: float = 5.0) -> dict:
    """In-process guard: wait (bounded) until the instantaneous co-tenant
    CPU busy fraction drops below ``busy_thresh``. Returns the ambient
    reading the caller started its timed section under:
    ``{"load": 1-min loadavg, "busy": busy fraction, "waited_s": n}``.
    Env: SPARK_GRAFT_QUIET_BUSY (default 0.25 — ~8 of 32 cores),
    SPARK_GRAFT_QUIET_WAIT_S (default 180 per row; the per-row cap is
    deliberately smaller than run_scaling's per-level cap so a dozen
    guarded rows cannot stall the bench for an hour)."""
    if busy_thresh is None:
        busy_thresh = float(os.environ.get("SPARK_GRAFT_QUIET_BUSY", "0.25"))
    if max_wait_s is None:
        max_wait_s = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT_S", "180"))
    t0 = time.time()
    busy = cpu_busy()
    while busy >= busy_thresh and time.time() - t0 < max_wait_s:
        time.sleep(poll_s)
        busy = cpu_busy()
    return {"load": round(loadavg(), 2), "busy": round(busy, 3),
            "waited_s": round(time.time() - t0, 1)}


def wait_quiet_load(thresh: float | None = None,
                    max_wait_s: int | None = None) -> float:
    """Between-process guard (run_scaling's original semantics): wait
    (bounded) for the 1-min loadavg to settle below ``thresh``. Env:
    SPARK_GRAFT_QUIET_THRESH (default 2.0),
    SPARK_GRAFT_QUIET_WAIT_S (default 600)."""
    if thresh is None:
        thresh = float(os.environ.get("SPARK_GRAFT_QUIET_THRESH", "2.0"))
    if max_wait_s is None:
        max_wait_s = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT_S", "600"))
    t0 = time.time()
    load = loadavg()
    while load >= thresh and time.time() - t0 < max_wait_s:
        time.sleep(15)
        load = loadavg()
    return load
