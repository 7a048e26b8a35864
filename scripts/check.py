#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only, not part
of the library): runs graft.Verify output against the DuckDB oracle and
reports per-query row/schema/value match.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
(run `scripts/verify.sh <sfDir> <outDir>` first to produce the parquet dumps)
"""
import json, math, sys

import duckdb

def canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(round(v, 9)))
            elif isinstance(v, list):
                vals.append(json.dumps([str(x) for x in v]))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = canon(con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = canon(con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                " FROM (" + sql + ")").fetchall())
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
        elif spark_rows != duck_rows:
            diff_s = [r for r in spark_rows if r not in set(duck_rows)][:3]
            diff_d = [r for r in duck_rows if r not in set(spark_rows)][:3]
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            print(f"  spark-only: {diff_s}")
            print(f"  duck-only:  {diff_d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
