"""Simulate the driver's CORRECTNESS compare over the evaluation window.

The driver takes the FIRST 50 entries of ``queries()``, runs each at
sf0.01 next to its ``oracle_sql()`` in DuckDB, canonicalizes both frames
(columns sorted by name, ``sort_values`` over all columns) and hashes
``repr(v)`` per cell.  A green tests/test_oracle_parity.py (sf0.001,
tolerant compare) does NOT guarantee this hash matches — run this before
round end (playbook memory, r9).

Usage: python tools/driver_sim.py [name ...]   (default: whole window)
"""

import glob
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")


def _canon(pdf):
    cols = sorted(pdf.columns)
    c = pdf[cols].sort_values(by=cols).reset_index(drop=True)
    h = hashlib.md5()
    for col in cols:
        for v in c[col]:
            h.update(repr(v).encode())
    return cols, [str(c[col].dtype) for col in cols], h.hexdigest()


def main():
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = E.queries()
    oracles = E.oracle_sql()
    names = sys.argv[1:] or list(queries)[:50]
    bad = []
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            pdf = pd.DataFrame(
                [r.asDict(recursive=True) for r in df.collect()],
                columns=df.columns)
            if name not in oracles:
                print(f"{name:28s} rows={len(pdf)} (no oracle — rows-only)")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            ca, ta, ha = _canon(pdf)
            cb, tb, hb = _canon(odf)
            rows = len(pdf) == len(odf)
            schema = ca == cb
            hmatch = ha == hb
            ok = rows and schema and hmatch
            flag = "OK " if ok else "FAIL"
            print(f"{name:28s} {flag} rows={len(pdf)}/{len(odf)} "
                  f"schema={schema} hash={hmatch}")
            if not ok:
                bad.append(name)
                if not schema:
                    print(f"   spark cols {ca}\n   oracle cols {cb}")
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"{name:28s} ERR {type(exc).__name__}: {exc}")
    print(f"\n{len(names) - len(bad)}/{len(names)} green"
          + (f"; FAILING: {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
