#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
from a Verify dump's oracle_sql.json in DuckDB over the same parquet
tables, and compare row count, schema (column names sorted), and a
value hash against the Spark result parquet. Validation tooling only —
NOT part of the library (the engine itself is pure Scala/Spark).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
       [--json <artifact.json>]  # also write a CORRECTNESS-style artifact
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns ints, floats to 6dp strings
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == "float64":
            df[c] = df[c].map(lambda v: f"{v:.6f}" if pd.notna(v) else "NaN")
    rows = sorted(df.astype(str).agg("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}")
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": "missing spark output"}
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}")
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": str(e)[:200]}
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and canon(got) == canon(want)
        report[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                        "hash_match": ok_hash, "spark_rows": len(got),
                        "oracle_rows": len(want), "err": None}
        if ok_rows and ok_cols and ok_hash:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL     {name} rows={len(got)}/{len(want)} "
                  f"cols_ok={ok_cols} hash_ok={ok_hash}")
            if ok_cols and not ok_hash:
                m = got.reindex(sorted(got.columns), axis=1).head(3)
                w = want.reindex(sorted(want.columns), axis=1).head(3)
                print("  got:", m.to_dict("records"))
                print("  want:", w.to_dict("records"))
    print(f"== {n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": report}, f, indent=1)


if __name__ == "__main__":
    main()
