#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT shipped to Spark).

Runs DuckDB over the oracle SQL dumped by graft.Verify and compares each
query's result set against the parquet Verify wrote. Usage:

    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # sort columns by name, then rows by all columns; stringify for hashing
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}")
            n_fail += 1
        elif gr != wr:
            diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"ROWS     {name}: {len(gr)} vs {len(wr)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
