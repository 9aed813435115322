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

SEED = int(os.environ.get("GRAFT_FUZZ_SEED", "20260815"))  # fresh-seed convergence sweeps override
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
    a_keys = [r[key_col - 1] for r in rows if len(r) >= key_col]
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

# When set (header templates), a-side refs render as a.name / a["two words"]
# 70% of the time; positional a{i} stays valid alongside a header in both
# engines and keeps rendering otherwise.
COLNAMES = None


def aref(rng, i):
    if COLNAMES is not None and rng.random() < 0.7:
        nm = COLNAMES[i - 1]
        if " " in nm:
            return f"a['{nm}']", f'a["{nm}"]'
        return f"a.{nm}", f"a.{nm}"
    return f"a{i}", f"a{i}"


def icol(rng, side="a"):
    if side == "a":
        p, s = aref(rng, rng.choice(INT_COLS))
    else:
        p = s = "b3"
    return {"py": f"int({p})", "sql": f"cast({s} as int)"}


def fcol(rng):
    p, s = aref(rng, rng.choice(FLOAT_COLS))
    return {"py": f"float({p})", "sql": f"cast({s} as double)"}


def wcol(rng, side="a"):
    if side == "a":
        p, s = aref(rng, rng.choice(WORD_COLS))
    else:
        p = s = "b2"
    return {"py": p, "sql": s}


def int_expr(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.3:
        return icol(rng)
    if r < 0.38:
        v = rng.choice(["NR", "NF"])
        return {"py": v, "sql": v}
    if r < 0.46:
        c = wcol(rng)
        return {"py": f"len({c['py']})", "sql": f"length({c['sql']})"}
    if r < 0.58:
        a, k = int_expr(rng, depth + 1), rng.randint(0, 20)
        return {"py": f"({a['py']} + {k})", "sql": f"({a['sql']} + {k})"}
    if r < 0.68:
        a, k = int_expr(rng, depth + 1), rng.randint(1, 30)
        return {"py": f"({a['py']} - {k})", "sql": f"({a['sql']} - {k})"}
    if r < 0.78:
        a, k = int_expr(rng, depth + 1), rng.randint(1, 3)
        return {"py": f"({a['py']} * {k})", "sql": f"({a['sql']} * {k})"}
    if r < 0.86:
        # 2-arg scalar min/max: Python builtin <-> graft polymorphic min/max
        a, k = int_expr(rng, depth + 1), rng.randint(0, 60)
        m = rng.choice(["min", "max"])
        return {"py": f"{m}({a['py']}, {k})", "sql": f"{m}({a['sql']}, {k})"}
    if r < 0.93:
        c, a, b = cond(rng, 2), int_expr(rng, depth + 1), rng.randint(0, 99)
        return {"py": f"({a['py']} if {c['py']} else {b})",
                "sql": f"if({c['sql']}, {a['sql']}, {b})"}
    # % through abs() so Python and SQL never see a negative operand
    # (they disagree on the sign of negative modulo)
    a, k = int_expr(rng, depth + 1), rng.randint(2, 7)
    return {"py": f"(abs({a['py']}) % {k})", "sql": f"(abs({a['sql']}) % {k})"}


def float_expr(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.4:
        return fcol(rng)
    if r < 0.55:
        a, k = float_expr(rng, depth + 1), rng.randint(1, 50) / 10.0
        return {"py": f"({a['py']} + {k})", "sql": f"({a['sql']} + {k})"}
    if r < 0.65:
        a, k = float_expr(rng, depth + 1), rng.randint(1, 40) / 10.0
        return {"py": f"({a['py']} - {k})", "sql": f"({a['sql']} - {k})"}
    if r < 0.78:
        a, k = float_expr(rng, depth + 1), rng.randint(1, 30) / 10.0
        return {"py": f"({a['py']} * {k})", "sql": f"({a['sql']} * {k})"}
    if r < 0.9:
        # `/` is float division in both dialects (Python 3 true division,
        # Spark's `/` always returns double)
        a = rng.choice([float_expr, int_expr])(rng, depth + 1)
        k = rng.randint(2, 9)
        return {"py": f"({a['py']} / {k})", "sql": f"({a['sql']} / {k})"}
    a, b = float_expr(rng, depth + 1), icol(rng)
    return {"py": f"({a['py']} + {b['py']})", "sql": f"({a['sql']} + {b['sql']})"}


def str_expr(rng, depth=0):
    r = rng.random()
    if depth >= 1 or r < 0.4:
        return wcol(rng)
    if r < 0.55:
        c = wcol(rng)
        m = rng.choice(["upper", "lower"])
        return {"py": f"{c['py']}.{m}()", "sql": f"{m}({c['sql']})"}
    if r < 0.68:
        c, suf = wcol(rng), rng.choice(["_t", "-x", "Q"])
        return {"py": f"({c['py']} + '{suf}')", "sql": f"({c['sql']} || '{suf}')"}
    if r < 0.78:
        c = wcol(rng)
        old = rng.choice(["a", "e", "t", "mu"])
        new = rng.choice(["#", "ZZ", ""])
        return {"py": f"{c['py']}.replace('{old}', '{new}')",
                "sql": f"replace({c['sql']}, '{old}', '{new}')"}
    if r < 0.9:
        cd, a = cond(rng, 2), wcol(rng)
        alt = rng.choice(VOCAB)
        return {"py": f"({a['py']} if {cd['py']} else '{alt}')",
                "sql": f"if({cd['sql']}, {a['sql']}, '{alt}')"}
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
    if r < 0.66:
        c = wcol(rng)
        p = rng.choice(["al", "be", "g", "K", "mu", "x"])
        m = rng.choice(["startswith", "endswith"])
        return {"py": f"{c['py']}.{m}('{p}')",
                "sql": f"{m}({c['sql']}, '{p}')"}
    if r < 0.7:
        c = wcol(rng)
        n = rng.choice(["a", "t", "mu", "K", "-"])
        return {"py": f"'{n}' in {c['py']}",
                "sql": f"contains({c['sql']}, '{n}')"}
    if r < 0.74:
        c = wcol(rng)
        if rng.random() < 0.5:
            p = rng.choice(["al%", "%ta", "%m%", "K%A", "_eta"])
            return {"py": f"like({c['py']}, '{p}')",
                    "sql": f"{c['sql']} LIKE '{p}'"}
        p = rng.choice(["[ae]l", "ta$", "^[gz]", "u.n"])
        return {"py": f"re.search('{p}', {c['py']}) is not None",
                "sql": f"regexp_like({c['sql']}, '{p}')"}
    if r < 0.78 and depth == 0:
        # bare truthiness: Python nonzero int / non-empty string. Top-level
        # WHERE only — inside AND/OR/NOT the SQL side needs a boolean
        a = rng.choice([int_expr(rng, 2), wcol(rng)])
        return a
    if r < 0.82:
        k, m = rng.randint(2, 5), rng.randint(0, 1)
        return {"py": f"NR % {k} == {m}", "sql": f"NR % {k} == {m}"}
    if r < 0.9:
        a, b = cond(rng, depth + 1), cond(rng, depth + 1)
        op = rng.choice([("and", "AND"), ("or", "OR")])
        return {"py": f"({a['py']} {op[0]} {b['py']})",
                "sql": f"({a['sql']} {op[1]} {b['sql']})"}
    a = cond(rng, depth + 1)
    return {"py": f"not ({a['py']})", "sql": f"NOT ({a['sql']})"}


def agg_expr(rng):
    kind = rng.choice(["COUNT", "SUM", "SUM", "MIN", "MAX", "AVG",
                       "MEDIAN", "VARIANCE", "ARRAY_AGG"])
    if kind == "COUNT":
        c = wcol(rng)
        return {"py": f"COUNT({c['py']})", "sql": f"COUNT({c['sql']})"}
    if kind == "ARRAY_AGG":
        c = wcol(rng)
        if rng.random() < 0.4:  # sorted-callback form (one fixed mapping)
            return {"py": f"ARRAY_AGG({c['py']}, lambda v: sorted(v))",
                    "sql": f"ARRAY_AGG({c['sql']}, v -> sort_array(v))"}
        return {"py": f"ARRAY_AGG({c['py']})", "sql": f"ARRAY_AGG({c['sql']})"}
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
    # DESC reverses the WHOLE key tuple in the reference (sort(reverse=True)
    # over the composite key), not the last key alone — probed
    keys = [rng.choice([int_expr, float_expr, str_expr])(rng)
            for _ in range(rng.randint(1, 2))]
    desc = rng.random() < 0.5
    lim = rng.randint(2, 8) if rng.random() < 0.4 else None
    py, sql = mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else "",
         "ORDER BY " + ", ".join(k["py"] for k in keys),
         "DESC" if desc else "",
         f"LIMIT {lim}" if lim else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else "",
         "ORDER BY " + ", ".join(k["sql"] for k in keys),
         "DESC" if desc else "",
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


def t_joinragged(rng):
    """Ragged A + positional join keys (r14 parity fix: the reference's
    safe_join_get errors per record when a record is shorter than the
    key index — 'No "aN" field at record NR' — while in-range ragged
    keys must join normally; graft previously rejected ragged-table
    positional keys statically or bound null). Select list sticks to a1
    (always present) + b-side so the error surface is the KEY."""
    key = rng.choice([1, 2, 3])
    kind = rng.choice(["INNER JOIN", "LEFT JOIN"])
    bsel = rng.choice(["b2", "b3"])
    py, sql = mk(
        ["SELECT", ", ".join(["a1", bsel]), f"{kind} B ON a{key} == b1"],
        ["SELECT", ", ".join(["a1", bsel]), f"{kind} B ON a{key} == b1"])
    return py, sql, False, key


def t_update(rng):
    tgts = rng.sample([2, 3, 5], rng.randint(1, 2))
    assigns = [(t, str_expr(rng) if t in WORD_COLS else float_expr(rng))
               for t in tgts]
    w = cond(rng) if rng.random() < 0.8 else None
    py, sql = mk(
        ["UPDATE " + ", ".join(f"a{t} = {e['py']}" for t, e in assigns),
         f"WHERE {w['py']}" if w else ""],
        ["UPDATE " + ", ".join(f"a{t} = {e['sql']}" for t, e in assigns),
         f"WHERE {w['sql']}" if w else ""])
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


def t_strict(rng):
    """STRICT LEFT JOIN: B must hold exactly one row per A key value."""
    key = rng.choice(WORD_COLS + INT_COLS)
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    bsel = rng.choice(["b2", "b3"])
    py, sql = mk(
        ["SELECT", ", ".join([e["py"] for e in es] + [bsel]),
         f"STRICT LEFT JOIN B ON a{key} == b1"],
        ["SELECT", ", ".join([e["sql"] for e in es] + [bsel]),
         f"STRICT LEFT JOIN B ON a{key} == b1"])
    return py, sql, True, -key  # negative marks "exact cover" join table


HEADER = ["uid", "price", "word", "qty", "the tag"]


def t_header(rng):
    """Named-column access (a.name / a["two words"]) over a headered table."""
    global COLNAMES
    COLNAMES = HEADER
    try:
        fn = rng.choice([t_plain_select, t_select_order, t_groupby,
                         t_update, t_distinct])
        py, sql, ordered, _ = fn(rng)
        return py, sql, ordered, None
    finally:
        COLNAMES = None


def t_error(rng):
    """Error parity: the reference must raise; graft must raise too."""
    kind = rng.choice(["int_word", "agg_misuse", "single_eq", "agg_word"])
    if kind == "int_word":
        i = rng.choice(WORD_COLS)
        if rng.random() < 0.5:
            return f"SELECT int(a{i})", f"SELECT cast(a{i} as int)", True, None
        return (f"SELECT a1 WHERE int(a{i}) > 3",
                f"SELECT a1 WHERE cast(a{i} as int) > 3", True, None)
    if kind == "agg_misuse":
        a = agg_expr(rng)
        return (f"SELECT a1, {a['py']}", f"SELECT a1, {a['sql']}", True, None)
    if kind == "single_eq":
        c = wcol(rng)
        w = rng.choice(VOCAB)
        return (f"SELECT a1 WHERE {c['py']} = '{w}'",
                f"SELECT a1 WHERE {c['sql']} = '{w}'", True, None)
    i = rng.choice(WORD_COLS)
    ag = rng.choice(["MAX", "MIN", "SUM", "AVG", "MEDIAN"])
    return f"SELECT {ag}(a{i})", f"SELECT {ag}(a{i})", True, None


def t_join_comp(rng):
    """Composite (AND) join keys; B carries both key columns."""
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    py, sql = mk(
        ["SELECT", ", ".join([e["py"] for e in es] + ["b3"]),
         "INNER JOIN B ON a3 == b1 and a5 == b2"],
        ["SELECT", ", ".join([e["sql"] for e in es] + ["b3"]),
         "INNER JOIN B ON a3 == b1 and a5 == b2"])
    return py, sql, False, 0  # 0 marks the composite join-table shape


def t_distinct_count(rng):
    c = rng.choice(WORD_COLS + INT_COLS)
    w = cond(rng) if rng.random() < 0.5 else None
    py, sql = mk(
        [f"SELECT DISTINCT COUNT a{c}", f"WHERE {w['py']}" if w else ""],
        [f"SELECT DISTINCT COUNT a{c}", f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_global_agg(rng):
    aggs = [agg_expr(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.3:
        aggs.insert(0, {"py": "COUNT(*)", "sql": "COUNT(*)"})
    w = cond(rng) if rng.random() < 0.5 else None
    py, sql = mk(
        ["SELECT", ", ".join(a["py"] for a in aggs),
         f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(a["sql"] for a in aggs),
         f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def gen_join_composite(rng, rows):
    """B keyed by (a3, a5) pairs: b1, b2 key cols + b3 payload."""
    pairs = []
    for _ in range(rng.randint(3, 8)):
        if rng.random() < 0.7 and rows:
            r = rng.choice(rows)
            pairs.append((r[2], r[4]))
        else:
            pairs.append((rng.choice(VOCAB), rng.choice(VOCAB)))
    pairs = list(dict.fromkeys(pairs))
    return [[k1, k2, rng.choice(VOCAB)] for k1, k2 in pairs]


def t_unnest(rng):
    """UNNEST over a split of a word column — one output record per
    element, composed with ordinary select items and WHERE. Splitters
    are plain letters/underscore: Python str.split and Spark split
    (limit -1) agree on consecutive separators and trailing empties."""
    ch = rng.choice(["a", "e", "t", "_", "m"])
    c = wcol(rng)
    other = value_expr(rng)
    w = cond(rng) if rng.random() < 0.5 else None
    un_py = f'UNNEST({c["py"]}.split("{ch}"))'
    un_sql = f"UNNEST(split({c['sql']}, '{ch}'))"
    first = rng.random() < 0.5
    items_py = [un_py, other["py"]] if first else [other["py"], un_py]
    items_sql = [un_sql, other["sql"]] if first else [other["sql"], un_sql]
    py, sql = mk(
        ["SELECT", ", ".join(items_py), f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(items_sql), f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_unpack(rng):
    """Star-unpack `*expr` — spreads a list INTO the output record,
    producing ragged (variable-width) output rows."""
    ch = rng.choice(["a", "e", "t", "_", "m"])
    c = wcol(rng)
    up_py = f'*{c["py"]}.split("{ch}")'
    up_sql = f"*split({c['sql']}, '{ch}')"
    w = cond(rng) if rng.random() < 0.4 else None
    if rng.random() < 0.7:
        other = value_expr(rng)
        first = rng.random() < 0.5
        items_py = [up_py, other["py"]] if first else [other["py"], up_py]
        items_sql = [up_sql, other["sql"]] if first else [other["sql"], up_sql]
    else:
        items_py, items_sql = [up_py], [up_sql]
    py, sql = mk(
        ["SELECT", ", ".join(items_py), f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(items_sql), f"WHERE {w['sql']}" if w else ""])
    return py, sql, True, None


def t_pipe(rng):
    """Pipe-chained stages: a width-preserving UPDATE (so stage-2
    variables keep their meaning) into a SELECT — including NR in
    stage 2, which must be the PIPED stage's record number (per-stage
    NR reset), and stage-2 WHERE over stage-1's updated values."""
    tgt = rng.choice(WORD_COLS)
    e = str_expr(rng)
    w1 = cond(rng) if rng.random() < 0.5 else None
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.5:
        es = es + [{"py": "NR", "sql": "NR"}]
    w2 = cond(rng) if rng.random() < 0.4 else None
    py, sql = mk(
        [f"UPDATE a{tgt} = {e['py']}", f"WHERE {w1['py']}" if w1 else "",
         "|", "SELECT", ", ".join(x["py"] for x in es),
         f"WHERE {w2['py']}" if w2 else ""],
        [f"UPDATE a{tgt} = {e['sql']}", f"WHERE {w1['sql']}" if w1 else "",
         "|", "SELECT", ", ".join(x["sql"] for x in es),
         f"WHERE {w2['sql']}" if w2 else ""])
    return py, sql, True, None


def t_oor(rng):
    """Out-of-range positional reads bind None (reference safe_get
    padding, probed live: `select a9` over a 5-column table emits None
    values; only sub-1 indices and JOIN keys error) — round-13 parity
    fix, pinned here so it cannot regress."""
    hi = rng.randint(6, 9)
    ref = (f"a{hi}", f"a{hi}") if rng.random() < 0.6 else \
        (f"a[{hi}]", f"a[{hi}]")
    es = [value_expr(rng), {"py": ref[0], "sql": ref[1]}]
    if rng.random() < 0.5:
        es.reverse()
    hi2 = rng.randint(6, 9)
    r = rng.random()
    if r < 0.35:
        w = {"py": f"a{hi2} == None", "sql": f"a{hi2} is null"}
    elif r < 0.6:
        # `not a9` in Python is truthiness-of-None = True; the SQL dialect
        # renders the same predicate as `is null` (bare truthiness under
        # NOT is a documented dialect boundary — SQL NOT null-propagates)
        w = {"py": f"not a{hi2}", "sql": f"a{hi2} is null"}
    else:
        w = cond(rng)
    py, sql = mk(
        ["SELECT", ", ".join(e["py"] for e in es), f"WHERE {w['py']}"],
        ["SELECT", ", ".join(e["sql"] for e in es), f"WHERE {w['sql']}"])
    return py, sql, True, None


TEMPLATES = [
    ("plain", t_plain_select, 85),
    ("order", t_select_order, 85),
    ("top", t_top, 55),
    ("distinct", t_distinct, 55),
    ("group", t_groupby, 75),
    ("join", t_join, 75),
    ("update", t_update, 50),
    ("star", t_star, 25),
    ("except", t_except, 30),
    ("strict", t_strict, 40),
    ("header", t_header, 60),
    ("error", t_error, 24),
    ("joincomp", t_join_comp, 35),
    ("dcount", t_distinct_count, 15),
    ("gagg", t_global_agg, 40),
    # round-13 widening (r12 verdict item 6): surfaces the templates
    # didn't draw — UNNEST, *unpack ragged output, pipe chaining with
    # per-stage NR. (Computed a[expr] indices are NOT in the reference's
    # variable model — probed: `a[NR % 2 + 1]` raises a field-miss — and
    # WITH (header/noheader) only acts on the CSV surface, covered by
    # gen_csv_differential's with-flip cases.)
    ("unnest", t_unnest, 30),
    ("unpack", t_unpack, 25),
    ("pipe", t_pipe, 30),
    ("oor", t_oor, 25),
    # ragged A tables under JOIN: in-range keys join (warning tolerated),
    # short-record keys become expected_error cases (reference
    # safe_join_get per-record error)
    ("joinragged", t_joinragged, 30),
]


def gen_join_exact_cover(rng, rows, key_col):
    """B with exactly one row per distinct A key (STRICT LEFT requirement),
    plus a few rows under keys that cannot collide with A values."""
    keys = list(dict.fromkeys(r[key_col - 1] for r in rows))
    b = [[k, rng.choice(VOCAB), str(rng.randint(0, 50))] for k in keys]
    for _ in range(rng.randint(0, 3)):
        k = (str(rng.randint(200, 300)) if key_col in INT_COLS
             else rng.choice(VOCAB) + "_XX")
        b.append([k, rng.choice(VOCAB), str(rng.randint(0, 50))])
    rng.shuffle(b)
    return list(dict((r[0], r) for r in b).values())


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
            if tname == "joinragged":
                table = [list(r)[:rng.randint(1, 5)]
                         if rng.random() < 0.35 else list(r) for r in table]
            names = HEADER if tname == "header" else None
            if join_key is None:
                join_table = None
            elif join_key == 0:
                join_table = gen_join_composite(rng, table)
            elif join_key < 0:
                join_table = gen_join_exact_cover(rng, table, -join_key)
            else:
                join_table = gen_join_table(rng, table, join_key)
            out, warnings = [], []
            err = None
            try:
                rbql.query_table(py, [list(r) for r in table], out, warnings,
                                 join_table=join_table,
                                 input_column_names=(list(names) if names
                                                     else None))
            except Exception as e:
                err = e
            if tname == "error":
                if err is None:
                    continue  # didn't trip the reference — try another draw
            elif tname == "joinragged" and err is not None:
                # keep ONLY the per-record missing-key class as an
                # expected_error case; anything else is a generator bug
                if "field at record" not in str(err):
                    continue
            elif err is not None:
                n_err += 1
                if n_err <= 10:
                    print(f"  [ref error] {tname}: {py} -> {err}",
                          file=sys.stderr)
                continue
            elif warnings:
                # ragged tables legitimately warn about inconsistent
                # widths; the engine corpus doesn't compare warnings
                if not (tname == "joinragged" and
                        all("is not consistent" in w for w in warnings)):
                    continue  # warning semantics are SourcesSpec territory
            cases.append({
                "name": f"fuzz_{tname}_{made:03d}",
                "template": tname,
                "query_py": py,
                "query_sql": sql,
                "input_table": table,
                "input_column_names": names,
                "join_table": join_table,
                "ordered": ordered,
                "expected_error": err is not None,
                "expected_output_table": None if err is not None else out,
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
