"""Local mirror of the driver's t2 correctness gate: every queries() entry
with an oracle_sql() runs on Spark AND DuckDB at sf0.01; results are
compared column-sorted, row-sorted, value-by-value (floats to 9 digits —
the real gate hashes, so queries round their doubles explicitly)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows(records, columns):
    cols = sorted(columns)
    out = [tuple(_canon(rec[c]) for c in cols) for rec in records]
    return sorted(out, key=repr)


def _duck(sql):
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.sql(sql)
    cols = cur.columns
    recs = [dict(zip(cols, row)) for row in cur.fetchall()]
    con.close()
    return recs, cols


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_parity(spark, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_recs = [r.asDict(recursive=True) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_recs) >= 0  # rows-only check
        return
    duck_recs, duck_cols = _duck(oracle)
    assert sorted(sdf.columns) == sorted(duck_cols), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(duck_cols)}"
    )
    s_rows = _rows(spark_recs, sdf.columns)
    d_rows = _rows(duck_recs, duck_cols)
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"
