#!/usr/bin/env python3
"""DEV-ONLY local replica of the driver's DuckDB correctness gate.

Not part of the shipped library (the engine is pure Scala/Spark). Runs each
oracle SQL from Verify's oracle_sql.json in DuckDB over the same parquet
tables, loads the corresponding Spark parquet output, sorts columns by name
and rows by all values, and compares cell-by-cell.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def key(row):
    return tuple((x is None, str(x)) for x in row)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted((tuple(norm(r[i]) for i in order) for r in spark_rows), key=key)
    d = sorted((tuple(norm(r[i]) for i in dorder) for r in duck_rows), key=key)
    if len(s) != len(d):
        return f"ROWS: spark={len(s)} duck={len(d)}"
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            # report first few diffs with tolerance info for floats
            diffs = []
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    tol = ""
                    if isinstance(x, float) and isinstance(y, float):
                        tol = f" (relerr={abs(x - y) / max(abs(x), abs(y), 1e-300):.2e})"
                    diffs.append(f"col {sorted(spark_cols)[j]}: {x!r} vs {y!r}{tol}")
            return f"VALUE mismatch at sorted row {i}: " + "; ".join(diffs[:4])
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failed = []
    import os
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(f"{out_dir}/{d}"))
    for name in declared:
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_rows, spark_cols = sp.fetchall(), [c[0] for c in sp.description]
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: cannot read spark output: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows, rows-only check: "
                  f"{'ok' if spark_rows else 'EMPTY'})")
            if not spark_rows:
                failed.append(name)
            continue
        try:
            dq = con.execute(oracles[name])
            duck_rows, duck_cols = dq.fetchall(), [c[0] for c in dq.description]
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        err = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if err:
            failed.append(name)
            print(f"FAIL {name}: {err}")
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
    print(f"\n{len(declared) - len(failed)}/{len(declared)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
