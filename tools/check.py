#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, load the Spark parquet result and run the oracle SQL
in DuckDB over the same testdata parquet, then compare row count,
schema (column names) and values (columns sorted by name, rows sorted
by all columns, floats rounded to 9 significant places).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
            o_rel = con.sql(sql)
            o_cols, o_rows = o_rel.columns, o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} "
                  f"oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs != co:
            diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)} "
                  f"first-diffs={diff}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(cs)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} with oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
