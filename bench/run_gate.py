"""Full-surface gate replica at an arbitrary scale factor (VERDICT r4
#3: the driver samples ~50 of the gate rows per round at sf0.01, so
rows it never drew had scale-matched verification only at the repo's
sf0.001 pytest replica). This runner executes EVERY queries() entry vs
its oracle_sql() through DuckDB at the given SF — the exact compare the
driver performs (row count + sorted-column schema + order-insensitive
canonical value equality) — and writes one JSON artifact per run, e.g.
GATE_sf0.01_r5.json.

Usage: python bench/run_gate.py [sf_dir] [out_json]
Env:   SPARK_GRAFT_CPUS (default 8)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(rows, cols):
    """The driver's order-insensitive canonical form (identical to
    tests/test_entry_contract.py): sort columns by name, round floats
    to 6 places, then sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, f"GATE_sf{sf_dir.rstrip('/').split('sf')[-1]}.json")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    import duckdb

    import __spark_entry__ as entry
    from engine.session import get_spark

    spark = get_spark("gate-replica", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    qs, sqls = entry.queries(), entry.oracle_sql()
    results, n_green = {}, 0
    t_start = time.time()
    for name in sorted(qs):
        t0 = time.time()
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
               "err": None}
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)
            if name not in sqls:
                # declared rows-only (entry.NO_ORACLE): the driver's
                # weaker check — recorded as such, never as a hash pass
                assert name in entry.NO_ORACLE, f"{name}: no oracle"
                row.update(rows_match=True, schema_match=None,
                           hash_match=None, oracle_rows=None,
                           rows_only=True)
            else:
                res = con.execute(sqls[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                row["oracle_rows"] = len(orows)
                row["schema_match"] = sorted(scols) == sorted(ocols)
                row["rows_match"] = len(srows) == len(orows)
                row["hash_match"] = (_canon(srows, scols)
                                     == _canon(orows, ocols))
        except Exception as e:  # noqa: BLE001 — recorded per row
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        row["wall_s"] = round(time.time() - t0, 2)
        ok = (row["err"] is None and row["rows_match"]
              and row["schema_match"] in (True, None)
              and row["hash_match"] in (True, None))
        n_green += bool(ok)
        results[name] = row
        print(f"{'ok ' if ok else 'FAIL'} {name} "
              f"({row['wall_s']}s)", file=sys.stderr)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_green": n_green,
        "wall_s": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("sf_dir", "n_queries", "n_green", "wall_s")}))
    spark.stop()
    sys.exit(0 if n_green == len(qs) else 1)


if __name__ == "__main__":
    main()
