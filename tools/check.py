#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT shipped to Spark).

Runs DuckDB over the oracle SQL dumped by graft.Verify and compares each
query's result set against the parquet Verify wrote. Usage:

    sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, os, sys
from collections import Counter
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Dtype-insensitive canonical form: unwrap numpy scalars to Python
    # (np.int32(1) vs int 1 would repr-differ), render all ints/floats
    # the same way regardless of width. numpy ARRAYS (list-typed result
    # columns) normalize elementwise — .item() only works on scalars.
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):
        v = v.tolist()
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def dtype_sig(df):
    # Coarse dtype class per column: the driver's hasher is dtype-sensitive
    # (int64 vs float64 mismatch is a red row even when values agree), so
    # an int-vs-float disagreement must fail locally too.
    def cls(dt):
        k = getattr(dt, "kind", "O")
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "ts", "m": "td"}.get(k, "obj")
    return {c: cls(df[c].dtype) for c in df.columns}


def canon(df):
    # sort columns by name; rows as a multiset of normalized tuples
    cols = sorted(df.columns)
    df = df[cols]
    rows = Counter(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
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
        gd, wd = dtype_sig(got), dtype_sig(want)
        dtype_mismatch = {c: (gd[c], wd[c]) for c in gd
                          if c in wd and gd[c] != wd[c]
                          # obj (decimal/string/list) vs numeric is often a
                          # DuckDB decimal artifact norm() handles; int-vs-
                          # float is the driver-red case — always flag it.
                          and {gd[c], wd[c]} == {"int", "float"}}
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}")
            n_fail += 1
        elif dtype_mismatch:
            print(f"DTYPE    {name}: int-vs-float disagreement {dtype_mismatch} "
                  f"(driver hasher would mark this red)")
            n_fail += 1
        elif gr != wr:
            # multiset diff: rows only-in-spark / only-in-oracle (no
            # zip truncation hiding extras when counts differ)
            only_spark = list((gr - wr).elements())[:3]
            only_oracle = list((wr - gr).elements())[:3]
            print(f"ROWS     {name}: {sum(gr.values())} vs {sum(wr.values())} rows; "
                  f"spark-only: {only_spark}; oracle-only: {only_oracle}")
            n_fail += 1
        else:
            print(f"OK       {name} ({sum(gr.values())} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
