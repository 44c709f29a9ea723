#!/usr/bin/env python3
"""Local twin of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables in
DuckDB, runs each oracle, loads the Spark-written parquet for the same query,
and compares after (a) sorting columns by name, (b) sorting rows.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(norm_cell(data[j][i]) for j in range(len(cols)))
            for i in range(tbl.num_rows)]
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck_tbl = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = table_rows(spark_tbl)
        dcols, drows = table_rows(duck_tbl)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if srows == drows:
            print(f"PASS {name} ({len(srows)} rows, ordered)")
            n_pass += 1
        elif sorted(srows) == sorted(drows):
            print(f"WARN {name}: rows equal only after sort "
                  f"({len(srows)} rows) — fix ORDER BY")
            n_pass += 1
        else:
            n_fail += 1
            ss, ds = set(srows), set(drows)
            only_s = list(ss - ds)[:3]
            only_d = list(ds - ss)[:3]
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(drows)} duck rows")
            for r in only_s:
                print(f"  spark-only: {r}")
            for r in only_d:
                print(f"  duck-only:  {r}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
