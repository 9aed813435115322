#!/usr/bin/env python3
"""Differential fuzz-corpus generator for the graft engine.

Generates random in-memory tables and random RBQL queries, emitting each
query in BOTH dialects from one expression AST:
  - `query_py`  — the reference's Python-expression dialect, executed here
                  against rbql-py (/root/reference/rbql-py) to produce the
                  expected output;
  - `query_sql` — graft's Spark-SQL expression dialect (SURVEY §7.1), the
                  same clause structure with expressions re-rendered.

The committed artifact (src/test/resources/differential/engine_fuzz.json)
is replayed by EngineFuzzSpec, which runs `query_sql` through
Graft.queryTableDf and compares against the reference output recorded
here. Deterministic under SEED; regenerate with:

    python3 tools/gen_differential.py

Tooling only — the reference engine is used strictly as an oracle; no
reference code ships. Numeric comparison happens on the Scala side with
9-significant-digit rounding (float-sum association differs between a
single-threaded Python fold and Spark partial aggregation).
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference/rbql-py")
import rbql  # noqa: E402

SEED = 20260815
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/differential/engine_fuzz.json")

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "eta", "theta", "Iota", "KAPPA", "mu_nu", "xi-om"]

# Fixed input schema: a1 int-string, a2 float-string, a3 word,
# a4 int-string, a5 word. No header (reference default a1..aN naming).
INT_COLS = [1, 4]
FLOAT_COLS = [2]
WORD_COLS = [3, 5]


def gen_table(rng):
    n = rng.randint(6, 25)
    rows = []
    for _ in range(n):
        rows.append([
            str(rng.randint(0, 99)),
            "%.1f" % (rng.randint(0, 200) / 10.0),
            rng.choice(VOCAB) if rng.random() > 0.08 else "",
            str(rng.randint(0, 99)),
            rng.choice(VOCAB),
        ])
    return rows


def gen_join_table(rng, rows, key_col):
    """B table: b1 keys overlapping the A-side key column, b2 word, b3 int."""
    a_keys = [r[key_col - 1] for r in rows]
    keys = []
    for _ in range(rng.randint(3, 8)):
        if rng.random() < 0.7 and a_keys:
            keys.append(rng.choice(a_keys))
        else:
            keys.append(rng.choice(VOCAB) if key_col in WORD_COLS
                        else str(rng.randint(0, 120)))
    if rng.random() < 0.8:  # mostly unique keys; sometimes dup-key fanout
        keys = list(dict.fromkeys(keys))
    return [[k, rng.choice(VOCAB), str(rng.randint(0, 50))] for k in keys]


# ---- expression AST: every node is {'py': str, 'sql': str} -------------

def icol(rng, side="a"):
    i = rng.choice(INT_COLS) if side == "a" else 3
    v = f"{side}{i}"
    return {"py": f"int({v})", "sql": f"cast({v} as int)"}


def fcol(rng):
    i = rng.choice(FLOAT_COLS)
    return {"py": f"float(a{i})", "sql": f"cast(a{i} as double)"}


def wcol(rng, side="a"):
    i = rng.choice(WORD_COLS) if side == "a" else 2
    v = f"{side}{i}"
    return {"py": v, "sql": v}


def int_expr(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.35:
        return icol(rng)
    if r < 0.45:
        return {"py": "NR", "sql": "NR"}
    if r < 0.55:
        c = wcol(rng)
        return {"py": f"len({c['py']})", "sql": f"length({c['sql']})"}
    if r < 0.75:
        a, k = int_expr(rng, depth + 1), rng.randint(0, 20)
        return {"py": f"({a['py']} + {k})", "sql": f"({a['sql']} + {k})"}
    if r < 0.9:
        a, k = int_expr(rng, depth + 1), rng.randint(1, 3)
        return {"py": f"({a['py']} * {k})", "sql": f"({a['sql']} * {k})"}
    # % on provably non-negative operands only (Python vs SQL differ on
    # negatives); all int sources here are >= 0 and +/* preserve that
    a, k = int_expr(rng, depth + 1), rng.randint(2, 7)
    return {"py": f"({a['py']} % {k})", "sql": f"({a['sql']} % {k})"}


def float_expr(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.5:
        return fcol(rng)
    if r < 0.7:
        a, k = float_expr(rng, depth + 1), rng.randint(1, 50) / 10.0
        return {"py": f"({a['py']} + {k})", "sql": f"({a['sql']} + {k})"}
    if r < 0.9:
        a, k = float_expr(rng, depth + 1), rng.randint(1, 30) / 10.0
        return {"py": f"({a['py']} * {k})", "sql": f"({a['sql']} * {k})"}
    a, b = float_expr(rng, depth + 1), icol(rng)
    return {"py": f"({a['py']} + {b['py']})", "sql": f"({a['sql']} + {b['sql']})"}


def str_expr(rng, depth=0):
    r = rng.random()
    if depth >= 1 or r < 0.5:
        return wcol(rng)
    if r < 0.7:
        c = wcol(rng)
        m = rng.choice(["upper", "lower"])
        return {"py": f"{c['py']}.{m}()", "sql": f"{m}({c['sql']})"}
    if r < 0.9:
        c, suf = wcol(rng), rng.choice(["_t", "-x", "Q"])
        return {"py": f"({c['py']} + '{suf}')", "sql": f"({c['sql']} || '{suf}')"}
    a = int_expr(rng, depth + 1)
    return {"py": f"str({a['py']})", "sql": f"cast({a['sql']} as string)"}


def value_expr(rng):
    return rng.choice([int_expr, float_expr, str_expr])(rng)


CMP = [(">", ">"), ("<", "<"), (">=", ">="), ("<=", "<="),
       ("==", "=="), ("!=", "!=")]


def cond(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.3:
        a, (cp, cs) = int_expr(rng), rng.choice(CMP)
        k = rng.randint(0, 99)
        return {"py": f"{a['py']} {cp} {k}", "sql": f"{a['sql']} {cs} {k}"}
    if r < 0.45:
        a, (cp, cs) = float_expr(rng), rng.choice(CMP[:4])
        k = rng.randint(0, 200) / 10.0
        return {"py": f"{a['py']} {cp} {k}", "sql": f"{a['sql']} {cs} {k}"}
    if r < 0.6:
        c = wcol(rng)
        w = rng.choice(VOCAB + [""])
        op = rng.choice(["==", "!="])
        return {"py": f"{c['py']} {op} '{w}'", "sql": f"{c['sql']} {op} '{w}'"}
    if r < 0.7:
        c = wcol(rng)
        p = rng.choice(["al", "be", "g", "K", "mu", "x"])
        return {"py": f"{c['py']}.startswith('{p}')",
                "sql": f"startswith({c['sql']}, '{p}')"}
    if r < 0.78:
        k, m = rng.randint(2, 5), rng.randint(0, 1)
        return {"py": f"NR % {k} == {m}", "sql": f"NR % {k} == {m}"}
    if r < 0.88:
        a, b = cond(rng, depth + 1), cond(rng, depth + 1)
        op = rng.choice([("and", "AND"), ("or", "OR")])
        return {"py": f"({a['py']} {op[0]} {b['py']})",
                "sql": f"({a['sql']} {op[1]} {b['sql']})"}
    a = cond(rng, depth + 1)
    return {"py": f"not ({a['py']})", "sql": f"NOT ({a['sql']})"}


def agg_expr(rng):
    kind = rng.choice(["COUNT", "SUM", "SUM", "MIN", "MAX", "AVG",
                       "MEDIAN", "VARIANCE"])
    if kind == "COUNT":
        c = wcol(rng)
        return {"py": f"COUNT({c['py']})", "sql": f"COUNT({c['sql']})"}
    # MIN/MAX/SUM/AVG/MEDIAN/VARIANCE coerce string args to numeric in the
    # reference (error on words) — aggregate only over numeric expressions
    inner = rng.choice([int_expr, float_expr])(rng)
    return {"py": f"{kind}({inner['py']})", "sql": f"{kind}({inner['sql']})"}


# ---- query templates ----------------------------------------------------

def mk(parts_py, parts_sql):
    return " ".join(p for p in parts_py if p), " ".join(p for p in parts_sql if p)


def t_plain_select(rng):
    es = [value_expr(rng) for _ in range(rng.randint(1, 3))]
    w = cond(rng) if rng.random() < 0.8 else None
    py, sql = mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_select_order(rng):
    es = [value_expr(rng) for _ in range(rng.randint(1, 3))]
    w = cond(rng) if rng.random() < 0.5 else None
    key = rng.choice([int_expr, float_expr, str_expr])(rng)
    desc = rng.random() < 0.5
    lim = rng.randint(2, 8) if rng.random() < 0.4 else None
    py, sql = mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else "",
         f"ORDER BY {key['py']}", "DESC" if desc else "",
         f"LIMIT {lim}" if lim else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else "",
         f"ORDER BY {key['sql']}", "DESC" if desc else "",
         f"LIMIT {lim}" if lim else ""])
    return py, sql, True, None


def t_top(rng):
    k = rng.randint(1, 6)
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    key = rng.choice([int_expr, str_expr])(rng)
    desc = rng.random() < 0.5
    py, sql = mk(
        [f"SELECT TOP {k}", ", ".join(e["py"] for e in es),
         f"ORDER BY {key['py']}", "DESC" if desc else ""],
        [f"SELECT TOP {k}", ", ".join(e["sql"] for e in es),
         f"ORDER BY {key['sql']}", "DESC" if desc else ""])
    return py, sql, True, None


def t_distinct(rng):
    es = [rng.choice([str_expr, int_expr])(rng)
          for _ in range(rng.randint(1, 2))]
    w = cond(rng) if rng.random() < 0.5 else None
    py, sql = mk(
        ["SELECT DISTINCT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else ""],
        ["SELECT DISTINCT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_groupby(rng):
    keyi = rng.choice(WORD_COLS)
    aggs = [agg_expr(rng) for _ in range(rng.randint(1, 3))]
    w = cond(rng) if rng.random() < 0.5 else None
    py, sql = mk(
        ["SELECT", ", ".join([f"a{keyi}"] + [a["py"] for a in aggs]),
         f"WHERE {w['py']}" if w else "", f"GROUP BY a{keyi}"],
        ["SELECT", ", ".join([f"a{keyi}"] + [a["sql"] for a in aggs]),
         f"WHERE {w['sql']}" if w else "", f"GROUP BY a{keyi}"])
    return py, sql, False, None


def t_join(rng):
    key = rng.choice(WORD_COLS + INT_COLS)
    kind = rng.choice(["INNER JOIN", "LEFT JOIN"])
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    bsel = rng.choice(["b2", "b3"])
    w = cond(rng) if rng.random() < 0.4 else None
    py, sql = mk(
        ["SELECT", ", ".join([e["py"] for e in es] + [bsel]),
         f"{kind} B ON a{key} == b1",
         f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join([e["sql"] for e in es] + [bsel]),
         f"{kind} B ON a{key} == b1",
         f"WHERE {w['sql']}" if w else ""])
    return py, sql, False, key


def t_update(rng):
    tgt = rng.choice([2, 3, 5])
    e = str_expr(rng) if tgt in WORD_COLS else float_expr(rng)
    w = cond(rng) if rng.random() < 0.8 else None
    py, sql = mk(
        [f"UPDATE a{tgt} = {e['py']}", f"WHERE {w['py']}" if w else ""],
        [f"UPDATE a{tgt} = {e['sql']}", f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_star(rng):
    w = cond(rng)
    shape = rng.choice(["*", "NR, *", "a3, *"])
    py, sql = mk(
        [f"SELECT {shape}", f"WHERE {w['py']}"],
        [f"SELECT {shape}", f"WHERE {w['sql']}"])
    return py, sql, True, None


def t_except(rng):
    cols = rng.sample([1, 2, 3, 4, 5], rng.randint(1, 2))
    drop = ", ".join(f"a{i}" for i in sorted(cols))
    w = cond(rng) if rng.random() < 0.6 else None
    py, sql = mk(
        [f"SELECT * EXCEPT {drop}", f"WHERE {w['py']}" if w else ""],
        [f"SELECT * EXCEPT {drop}", f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


TEMPLATES = [
    ("plain", t_plain_select, 70),
    ("order", t_select_order, 70),
    ("top", t_top, 40),
    ("distinct", t_distinct, 40),
    ("group", t_groupby, 60),
    ("join", t_join, 60),
    ("update", t_update, 40),
    ("star", t_star, 25),
    ("except", t_except, 25),
]


def main():
    rng = random.Random(SEED)
    cases = []
    n_err = 0
    for tname, fn, count in TEMPLATES:
        made = 0
        attempts = 0
        while made < count and attempts < count * 4:
            attempts += 1
            table = gen_table(rng)
            py, sql, ordered, join_key = fn(rng)
            join_table = (gen_join_table(rng, table, join_key)
                          if join_key is not None else None)
            out, warnings = [], []
            try:
                rbql.query_table(py, [list(r) for r in table], out, warnings,
                                 join_table=join_table)
            except Exception as e:  # reference rejects → record error parity
                n_err += 1
                if n_err <= 10:
                    print(f"  [ref error] {tname}: {py} -> {e}",
                          file=sys.stderr)
                continue  # only success cases in v1; errors are corpus work
            if warnings:
                continue  # warning semantics are SourcesSpec territory
            cases.append({
                "name": f"fuzz_{tname}_{made:03d}",
                "template": tname,
                "query_py": py,
                "query_sql": sql,
                "input_table": table,
                "join_table": join_table,
                "ordered": ordered,
                "expected_output_table": out,
            })
            made += 1
        if made < count:
            print(f"WARN: only {made}/{count} for {tname}", file=sys.stderr)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(cases)} cases to {OUT} "
          f"({n_err} generator attempts hit reference errors)")


if __name__ == "__main__":
    main()
