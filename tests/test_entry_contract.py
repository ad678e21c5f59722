"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() through DuckDB at sf0.001 (sf0.01 is the driver's scale; 0.001
keeps pytest fast — same tables, smaller)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
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


ALL = sorted(entry.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    q = entry.queries()[name]
    sqls = entry.oracle_sql()
    if name not in sqls:
        assert name in entry.NO_ORACLE, \
            f"{name} has no oracle and is not declared rows-only"
        rows = q(spark, SF_DIR).collect()
        assert len(rows) >= 0
        return
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sqls[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    assert _canon(srows, scols) == _canon(orows, ocols), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "conv_id", "turn_idx", "text", "score"}
