#!/usr/bin/env python3
"""CSV-path differential fuzz-corpus generator.

Like gen_differential.py (which drives the in-memory table path) but
end-to-end through the CSV surface: random CSV FILES — dialects (quoted /
simple / whitespace / monocolumn / quoted_rfc multiline), quoting hazards
(embedded delimiters, escaped double quotes, leading/trailing spaces),
headers, comment lines, BOM, ragged rows — queried through the reference's
`rbql.query_csv` to record the expected OUTPUT FILE BYTES and warning
texts. CsvFuzzSpec replays each case through graft's CLI (`Cli.run`) and
compares stdout byte-for-byte (line-set for unordered GROUP BY) and the
stderr warning set.

Float-valued select expressions are first-class since round 13: graft's
sink renders doubles through PyFloat.repr (exact CPython repr — verified
against live CPython over 500k doubles), so float outputs compare
byte-exactly like int/string. Float AGGREGATES other than MIN/MAX stay
excluded: Python sums sequentially while Spark sums in partition order,
and FP addition is not associative — the last-ulp disagreement would be
a summation-order artifact, not an engine bug.

Deterministic under SEED; regenerate with:
    python3 tools/gen_csv_differential.py
"""
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, "/root/reference/rbql-py")
import rbql  # noqa: E402

import gen_differential as gd  # noqa: E402  (shared expression grammar)

SEED = int(os.environ.get("GRAFT_FUZZ_SEED", "20260816"))  # fresh-seed convergence sweeps override
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/differential/csv_fuzz.json")

WORDS = gd.VOCAB + ["naïve", "Ωmega", "数据", "über", "a b", 'say "hi"']
# latin-1-encodable vocabulary for the binary-encoding byte path
LATIN_WORDS = gd.VOCAB + ["café", "nïce", "über", "søren", "a b"]
HEADER = ["uid", "price", "word", "qty", "tag"]


def int_agg(rng):
    """Aggregates with order-independent, byte-comparable output: COUNT,
    integral SUM, and MIN/MAX (which are exact for floats too — only
    float SUM/AVG are summation-order-sensitive)."""
    kind = rng.choice(["COUNT", "SUM", "MIN", "MAX"])
    if kind == "COUNT":
        c = gd.wcol(rng)
        return {"py": f"COUNT({c['py']})", "sql": f"COUNT({c['sql']})"}
    if kind in ("MIN", "MAX") and rng.random() < 0.4:
        inner = gd.float_expr(rng)
        return {"py": f"{kind}({inner['py']})", "sql": f"{kind}({inner['sql']})"}
    inner = gd.int_expr(rng)
    return {"py": f"{kind}({inner['py']})", "sql": f"{kind}({inner['sql']})"}


def value_expr(rng):
    return rng.choice([gd.int_expr, gd.str_expr, gd.float_expr])(rng)


# ---- CSV content rendering ----------------------------------------------

def cell_value(rng, typ, policy, delim, words=WORDS, pad=False):
    if typ == "int":
        v = str(rng.randint(0, 99))
    elif typ == "float":
        v = "%.1f" % (rng.randint(0, 200) / 10.0)
    else:
        v = rng.choice(words) if rng.random() > 0.06 else ""
    if pad and rng.random() < 0.4:  # strip_whitespaces cases (spaces only —
        # Python strip() and Spark trim() agree on the space char)
        return " " * rng.randint(1, 2) + v + " " * rng.randint(0, 2)
    if typ in ("int", "float"):
        return v
    w = v
    if policy == "whitespace":
        # whitespace policy: fields split on space runs — no spaces, no empty
        w = (w.replace(" ", "_").replace('"', "q") or "nil")
    elif policy == "simple":
        # simple split is literal on the delimiter; quotes are literal chars
        w = w.replace(delim, "_")
    elif policy in ("quoted", "quoted_rfc"):
        r = rng.random()
        if r < 0.10:
            w = w + delim + "inner"   # forces quoting
        elif r < 0.16:
            w = ' spaced ' + w        # leading/trailing spaces
        if policy == "quoted_rfc" and rng.random() < 0.06:
            w = w + "\nsecond line"   # multiline field (rfc only)
    return w


def render_field(v, policy, delim):
    if policy in ("quoted", "quoted_rfc"):
        if delim in v or '"' in v or "\n" in v:
            return '"' + v.replace('"', '""') + '"'
        return v
    return v


def gen_csv(rng, policy, delim, with_headers, comment_prefix, ragged=False,
            words=WORDS, pad=False):
    types = ["int", "float", "word", "int", "word"]
    n = rng.randint(6, 22)
    lines = []
    if with_headers:
        lines.append(delim.join(HEADER))
    rows = 0
    while rows < n:
        if comment_prefix and rng.random() < 0.12:
            lines.append(comment_prefix + " a comment " + str(rng.randint(0, 9)))
            continue
        vals = [cell_value(rng, t, policy, delim, words, pad) for t in types]
        if ragged and rng.random() < 0.3:
            vals = vals[:rng.randint(1, 4)]
        if policy == "whitespace":
            sep = " " * rng.randint(1, 3)
            lines.append(sep.join(vals))
        else:
            lines.append(delim.join(render_field(v, policy, delim)
                                    for v in vals))
        rows += 1
    return "\n".join(lines) + "\n"


# ---- query templates (int/string outputs only) ---------------------------

def t_plain(rng):
    es = [value_expr(rng) for _ in range(rng.randint(1, 3))]
    w = gd.cond(rng) if rng.random() < 0.8 else None
    return gd.mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else ""]) + (True,)


def t_float(rng):
    """Concentrated float-output coverage: division chains, mixed
    arithmetic, conditional floats — the Python-repr rendering surface
    (exponent switchovers, shortest-digit selection)."""
    es = [gd.float_expr(rng) for _ in range(rng.randint(1, 3))]
    scaled = gd.float_expr(rng)
    mag = rng.choice(["1e12", "1e16", "1e-5", "1e-3", "100000.0"])
    es.append({"py": f"({scaled['py']} * {mag})",
               "sql": f"({scaled['sql']} * cast({mag} as double))"})
    w = gd.cond(rng) if rng.random() < 0.5 else None
    return gd.mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else ""]) + (True,)


def t_withflip(rng):
    """Query-level WITH (header/noheader) override of the CLI header
    flag: the content is generated per the FLAG, so a flip makes the
    header line data (or the first data line a header). Positional
    variables only — name refs are invalid under a noheader override in
    both engines."""
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    w = gd.cond(rng) if rng.random() < 0.4 else None
    mode = rng.choice(["header", "noheader"])
    return gd.mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"WHERE {w['py']}" if w else "", f"WITH ({mode})"],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"WHERE {w['sql']}" if w else "", f"WITH ({mode})"]) + (True,)


def t_order(rng):
    es = [value_expr(rng) for _ in range(rng.randint(1, 2))]
    key = rng.choice([gd.int_expr, gd.str_expr, gd.float_expr])(rng)
    desc = rng.random() < 0.5
    lim = rng.randint(2, 8) if rng.random() < 0.4 else None
    return gd.mk(
        ["SELECT", ", ".join(e["py"] for e in es),
         f"ORDER BY {key['py']}", "DESC" if desc else "",
         f"LIMIT {lim}" if lim else ""],
        ["SELECT", ", ".join(e["sql"] for e in es),
         f"ORDER BY {key['sql']}", "DESC" if desc else "",
         f"LIMIT {lim}" if lim else ""]) + (True,)


def t_group(rng):
    keyi = rng.choice(gd.WORD_COLS)
    aggs = [int_agg(rng) for _ in range(rng.randint(1, 2))]
    w = gd.cond(rng) if rng.random() < 0.5 else None
    return gd.mk(
        ["SELECT", ", ".join([f"a{keyi}"] + [a["py"] for a in aggs]),
         f"WHERE {w['py']}" if w else "", f"GROUP BY a{keyi}"],
        ["SELECT", ", ".join([f"a{keyi}"] + [a["sql"] for a in aggs]),
         f"WHERE {w['sql']}" if w else "", f"GROUP BY a{keyi}"]) + (False,)


def t_update(rng):
    tgt = rng.choice(gd.WORD_COLS)
    e = gd.str_expr(rng)
    w = gd.cond(rng) if rng.random() < 0.8 else None
    return gd.mk(
        [f"UPDATE a{tgt} = {e['py']}", f"WHERE {w['py']}" if w else ""],
        [f"UPDATE a{tgt} = {e['sql']}", f"WHERE {w['sql']}" if w else ""]
    ) + (True,)


def t_star(rng):
    w = gd.cond(rng)
    shape = rng.choice(["*", "NR, *", "a3, *"])
    return gd.mk([f"SELECT {shape}", f"WHERE {w['py']}"],
                 [f"SELECT {shape}", f"WHERE {w['sql']}"]) + (True,)


def t_distinct(rng):
    es = [rng.choice([gd.str_expr, gd.int_expr])(rng)
          for _ in range(rng.randint(1, 2))]
    return gd.mk(["SELECT DISTINCT", ", ".join(e["py"] for e in es)],
                 ["SELECT DISTINCT", ", ".join(e["sql"] for e in es)]
                 ) + (True,)


def t_nf(rng):
    """Per-record NF over RAGGED rows (r14: the projected model's constant
    table-width NF diverged from the reference's len(record) — probed
    2,1,3 vs constant 3). Drawn with ragged inputs in main()."""
    py, sql = rng.choice([
        ("SELECT NR, NF", "SELECT NR, NF"),
        ("SELECT NF, a1", "SELECT NF, a1"),
        ("SELECT a1 WHERE NF > 2", "SELECT a1 WHERE NF > 2"),
        ("SELECT NF, *", "SELECT NF, *"),
        ("SELECT a.NF", "SELECT a.NF"),
    ])
    return py, sql, True


def t_except(rng):
    cols = rng.sample([1, 2, 3, 4, 5], rng.randint(1, 2))
    drop = ", ".join(f"a{i}" for i in sorted(cols))
    w = gd.cond(rng) if rng.random() < 0.6 else None
    return gd.mk([f"SELECT * EXCEPT {drop}", f"WHERE {w['py']}" if w else ""],
                 [f"SELECT * EXCEPT {drop}", f"WHERE {w['sql']}" if w else ""]
                 ) + (True,)


# (template, count, dialect pool) — whitespace/monocolumn get the
# star/plain templates only (their field model is narrower)
DIALECTS = [
    (",", "quoted"), (";", "quoted"), ("|", "quoted"), ("\t", "simple"),
    (",", "simple"),
]
TEMPLATES = [
    ("plain", t_plain, 45),
    ("float", t_float, 30),
    ("withflip", t_withflip, 20),
    ("order", t_order, 35),
    ("group", t_group, 30),
    ("update", t_update, 25),
    ("star", t_star, 20),
    ("distinct", t_distinct, 20),
    ("except", t_except, 15),
    # latin-1/binary encoding: exercises the byte-decode line scan and the
    # BOM-in-latin-1 strip; queries stay ascii (non-ascii queries are an
    # IO error under latin-1 in both engines)
    ("latin1", t_plain, 20),
    # strip_whitespaces=True: space-padded fields trimmed after split
    ("strip", t_plain, 15),
    # per-record NF over ragged rows (headerless draws exercise the
    # single-scan ragged fast path; headered draws the projected
    # greatest-non-null NF)
    ("nf", t_nf, 25),
]


def run_reference(py, content, delim, policy, out_delim, out_policy,
                  with_headers, comment_prefix, bom, encoding="utf-8",
                  strip=False):
    d = tempfile.mkdtemp()
    ip, op = os.path.join(d, "in.csv"), os.path.join(d, "out.csv")
    enc = "latin-1" if encoding == "latin-1" else "utf-8"
    with open(ip, "wb") as f:
        if bom:
            f.write(b"\xef\xbb\xbf")
        f.write(content.encode(enc))
    warnings = []
    rbql.query_csv(py, ip, delim, policy, op, out_delim, out_policy,
                   encoding, warnings, with_headers,
                   comment_prefix=comment_prefix, strip_whitespaces=strip)
    with open(op, "rb") as f:
        out = f.read().decode(enc)
    return out, warnings


def main():
    rng = random.Random(SEED)
    cases = []
    for tname, fn, count in TEMPLATES:
        made, attempts = 0, 0
        while made < count and attempts < count * 5:
            attempts += 1
            delim, policy = rng.choice(DIALECTS)
            if tname in ("plain", "star") and rng.random() < 0.2:
                delim, policy = rng.choice([(" ", "whitespace"),
                                            ("", "monocolumn")])
            if policy == "quoted" and tname not in ("latin1", "strip")                     and rng.random() < 0.25:
                policy = "quoted_rfc"
            encoding = "latin-1" if tname == "latin1" else "utf-8"
            strip = tname == "strip"
            words = LATIN_WORDS if tname == "latin1" else WORDS
            if tname == "latin1":
                delim, policy = rng.choice([(",", "quoted"), (";", "quoted"),
                                            (",", "simple")])
            if policy == "monocolumn":
                py, sql, ordered = ("SELECT a1 WHERE len(a1) > 3",
                                    "SELECT a1 WHERE length(a1) > 3", True)
                content = "\n".join(
                    rng.choice(WORDS).replace("\n", " ") or "nil"
                    for _ in range(rng.randint(5, 15))) + "\n"
                with_headers, comment_prefix, bom, ragged = False, None, False, False
            else:
                with_headers = rng.random() < 0.4
                if with_headers and tname != "withflip":
                    gd.COLNAMES = HEADER
                comment_prefix = "#" if (policy != "whitespace"
                                         and rng.random() < 0.25) else None
                bom = rng.random() < 0.12
                ragged = ((tname == "star" and policy == "simple"
                           and rng.random() < 0.4) or
                          (tname == "nf" and policy in ("simple", "quoted")
                           and rng.random() < 0.7))
                try:
                    py, sql, ordered = fn(rng)
                finally:
                    gd.COLNAMES = None
                content = gen_csv(rng, policy, delim, with_headers,
                                  comment_prefix, ragged, words=words,
                                  pad=strip)
            out_delim, out_policy = rng.choice(
                [(delim, policy), (delim, policy), ("\t", "simple"),
                 (",", "quoted")])
            if policy == "monocolumn":
                out_delim, out_policy = "", "monocolumn"
            try:
                expected, warns = run_reference(
                    py, content, delim, policy, out_delim, out_policy,
                    with_headers, comment_prefix, bom, encoding, strip)
            except Exception as e:
                if attempts <= 3:
                    print(f"  [ref error] {tname}: {py} -> {e}", file=sys.stderr)
                continue
            cases.append({
                "name": f"csvfuzz_{tname}_{made:03d}",
                "template": tname,
                "query_py": py,
                "query_sql": sql,
                "csv_content": content,
                "bom": bom,
                "delim": delim,
                "policy": policy,
                "out_delim": out_delim,
                "out_policy": out_policy,
                "with_headers": with_headers,
                "comment_prefix": comment_prefix,
                "encoding": encoding,
                "strip": strip,
                "ordered": ordered,
                "expected_output": expected,
                "expected_warnings": warns,
            })
            made += 1
        if made < count:
            print(f"WARN: only {made}/{count} for {tname}", file=sys.stderr)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
