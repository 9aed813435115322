#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads each <outdir>/<query>/ parquet (Spark output) and runs the
corresponding SQL from <outdir>/oracle_sql.json in DuckDB over the same
parquet tables; compares row count, column names (sorted), and a
value-normalized hash. This is test tooling only, never shipped code.

The DuckDB side is CACHED keyed by (query, sql text, sf-dir file
fingerprint): a recert after a change that can't affect a query's
oracle (same SQL, same testdata) replays the stored normalized rows
instead of re-running DuckDB — the sf0.1 recursive-CTE CC oracles cost
~45 min each, and a full recert at unchanged HEAD should take minutes.
The Spark side is always read fresh (it's what changed). Disable with
GRAFT_ORACLE_NOCACHE=1; cache dir overridable via GRAFT_ORACLE_CACHE
(default tools/.oracle_cache). Every PASS line says fresh/cached so a
certification record stays attributable.
"""
import sys, json, glob, os, math, decimal, hashlib

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    # DuckDB returns decimal literals (e.g. `0.5 AS p` widened by a UNION
    # to DECIMAL(3,2)) as decimal.Decimal, whose str keeps trailing zeros
    # ("0.50") — normalize through float like the driver's compare does
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def table_rows(tbl, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = []
    data = [tbl.column(i).to_pylist() for i in range(len(cols))]
    for r in range(tbl.num_rows):
        rows.append(tuple(norm(data[i][r]) for i in order))
    return rows


def sf_fingerprint(sfdir):
    """Cheap-but-content-sensitive testdata fingerprint: per table file,
    name + size + md5 of the first and last 1 MB (parquet footers carry
    the row-group metadata, so a regenerated file changes the tail even
    at equal size)."""
    h = hashlib.sha256()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        sz = os.path.getsize(p)
        h.update(f"{t}:{sz}:".encode())
        with open(p, "rb") as f:
            h.update(f.read(1 << 20))
            if sz > (1 << 20):
                f.seek(max(0, sz - (1 << 20)))
                h.update(f.read(1 << 20))
    return h.hexdigest()


def cache_path(cache_dir, name, sql, fp):
    key = hashlib.sha256(f"{name}\n{sql}\n{fp}".encode()).hexdigest()
    return os.path.join(cache_dir, f"{name}.{key[:16]}.json")


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    nocache = os.environ.get("GRAFT_ORACLE_NOCACHE") == "1"
    cache_dir = os.environ.get(
        "GRAFT_ORACLE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".oracle_cache"))
    if not nocache:
        os.makedirs(cache_dir, exist_ok=True)
    fp = None if nocache else sf_fingerprint(sfdir)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # targeted runs: GRAFT_CHECK_ONLY=q_a,q_b restricts, GRAFT_CHECK_SKIP
    # drops named queries (e.g. the hours-long sf0.1 all-pairs oracles
    # when they are checked in a separate background pass)
    only = os.environ.get("GRAFT_CHECK_ONLY")
    skip = set(os.environ.get("GRAFT_CHECK_SKIP", "").split(",")) - {""}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k not in skip}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{outdir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(qdir)
        scols = spark_tbl.column_names
        cpath = None if nocache else cache_path(cache_dir, name, sql, fp)
        cached = None
        if cpath and os.path.exists(cpath):
            try:
                cached = json.load(open(cpath))
            except Exception:
                cached = None
        if cached is not None:
            dcols = cached["cols"]
            drows = [tuple(r) for r in cached["rows"]]
            src = "cached"
        else:
            try:
                duck = con.sql(sql).fetch_arrow_table()
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}")
                n_fail += 1
                continue
            dcols = duck.column_names
            drows = table_rows(duck, dcols)
            src = "fresh"
            if cpath:
                tmp = cpath + ".tmp"
                json.dump({"cols": dcols, "rows": [list(r) for r in drows]},
                          open(tmp, "w"))
                os.replace(tmp, cpath)
        if sorted(scols) != sorted(c.lower() for c in dcols) and \
           sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            n_fail += 1
            continue
        srows = table_rows(spark_tbl, scols)
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            n_fail += 1
            continue
        if srows != drows:
            # find first diff
            diff = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: first diff at row {diff}:")
            print(f"  spark: {srows[diff]}")
            print(f"  duck : {drows[diff]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows, oracle {src})")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
