#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at sf0.01, compare row count, sorted
column names, and a value hash (columns sorted by name, rows sorted,
floats rounded the way each query already rounds).

Usage: python3 scripts/check_correctness.py [q_name ...]
"""

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
# scale-specific oracles (the tile fixture) must match the sweep scale
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Engine-neutral string form (numpy scalar reprs differ between
    pandas builds; ints may arrive as int32 vs int64)."""
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float).map(lambda v: f"{v:.12g}")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64").map(str)
        else:
            out[c] = s.map(str)
    return pd.DataFrame(out)


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = _canon(pdf[sorted(pdf.columns)])
    rows = sorted(
        tuple(row) for row in pdf.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import __spark_entry__ as e
    from pbf2json_spark.plans.session import build_session

    # SPARK_GRAFT_MASTER=local-cluster[4,8,4096] runs the whole gate on
    # separate executor JVMs (the multi-JVM realism rung)
    spark = build_session(app_name="check-correctness", cores=8,
                          shuffle_partitions=8,
                          master=os.environ.get("SPARK_GRAFT_MASTER"))
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"{name:28s} SPARK ERROR: {ex}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows={len(spdf):6d}  (no oracle)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"{name:28s} ORACLE ERROR: {ex}")
            continue
        rows_ok = len(spdf) == len(opdf)
        schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
        hash_ok = value_hash(spdf) == value_hash(opdf) if schema_ok else False
        ok = rows_ok and schema_ok and hash_ok
        if not ok:
            failures.append(name)
        print(f"{name:28s} rows={len(spdf):6d}/{len(opdf):6d} "
              f"schema={'Y' if schema_ok else 'N'} "
              f"hash={'Y' if hash_ok else 'N'} "
              f"{'OK' if ok else '** FAIL **'}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
