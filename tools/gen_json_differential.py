#!/usr/bin/env python3
"""Differential fuzz corpus for the JSON-lines surface, focused on the
missing-key dialect split (r13 verdict item 3).

Each case draws JSON records with OPTIONAL keys and a subscript query,
then records TWO expectations from the live reference
(/root/reference/rbql-py, used strictly as an oracle — no code ships):

  - strict expectation: the reference run on the RAW lines. A missing
    key raises `At record N, Details: 'key'` (rbql_engine.py:767 wraps
    the KeyError); graft reproduces this under
    `spark.graft.json.strictKeys=true`.
  - default expectation: the reference run on a PADDED copy where every
    key the query references is made explicit (absent -> null). This IS
    graft's documented default semantics (variant_get binds null for a
    missing key), so the padded oracle output pins the divergence
    byte-for-byte.

Replayed by JsonFuzzSpec in BOTH modes. Deterministic under SEED;
regenerate with: python3 tools/gen_json_differential.py
"""
import io
import json
import os
import random
import re
import sys

sys.path.insert(0, "/root/reference/rbql-py")
from rbql import rbql_json  # noqa: E402

SEED = int(os.environ.get("GRAFT_FUZZ_SEED", "20260816"))  # fresh-seed convergence sweeps override
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/differential/json_fuzz.json")

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
KEYS = ["name", "v", "w", "tag"]


def gen_records(rng):
    n = rng.randint(4, 12)
    recs = []
    for _ in range(n):
        rec = {}
        for k in KEYS:
            r = rng.random()
            if r < 0.25:
                continue  # absent
            if r < 0.35:
                rec[k] = None
            elif k in ("v", "w"):
                rec[k] = rng.randint(0, 99)
            else:
                rec[k] = rng.choice(WORDS)
        recs.append(rec)
    return recs


def gen_query(rng):
    k = rng.choice(KEYS)
    t = rng.random()
    if t < 0.4:
        return 'select a1["%s"]' % k, [k]
    j = rng.choice([x for x in KEYS if x != k])
    # NOTE: no LIMIT template — the reference's TopWriter evaluates one
    # record PAST the limit (write() returns False on the N+1-th attempt,
    # rbql_engine.py:489-495), so `limit 1` can raise on record 2. Graft's
    # LIMIT stops exactly at N rows; deliberate divergence, documented in
    # JsonFuzzSpec.
    if j in ("v", "w"):
        const = str(rng.randint(0, 99))
    else:
        const = '"%s"' % rng.choice(WORDS)
    return ('select a1["%s"] where a1["%s"] == %s' % (k, j, const),
            [j, k])


def run_ref(query, lines):
    src = os.path.join("/tmp", "graft_jsonfuzz_in.jsonl")
    dst = os.path.join("/tmp", "graft_jsonfuzz_out.jsonl")
    with io.open(src, "w", encoding="utf-8") as f:
        f.write("".join(l + "\n" for l in lines))
    warnings = []
    try:
        rbql_json.query_json(query, src, dst, warnings)
    except Exception as e:
        return None, str(e), warnings
    with io.open(dst, encoding="utf-8") as f:
        return f.read(), None, warnings


def main():
    rng = random.Random(SEED)
    cases, n_err_default = 0, 0
    out_cases = []
    attempts = 0
    # 50 cases; aim for a healthy mix of strict-error and strict-ok draws
    while cases < 50 and attempts < 400:
        attempts += 1
        recs = gen_records(rng)
        query, touched = gen_query(rng)
        raw_lines = [json.dumps(r, ensure_ascii=False, separators=(",", ":"))
                     for r in recs]
        padded = [dict(r) for r in recs]
        for r in padded:
            for k in touched:
                r.setdefault(k, None)
        padded_lines = [json.dumps(r, ensure_ascii=False,
                                   separators=(",", ":")) for r in padded]
        strict_out, strict_err, w1 = run_ref(query, raw_lines)
        default_out, default_err, w2 = run_ref(query, padded_lines)
        if default_err is not None or w2:
            n_err_default += 1
            continue  # padded run must be clean — it defines default mode
        if strict_err is not None and not re.match(
                r"^At record \d+, Details: '[^']*'$", strict_err):
            continue  # only the missing-key error class is in scope
        out_cases.append({
            "name": "jsonfuzz_%03d" % cases,
            "query": query,
            "input_lines": raw_lines,
            "default_output_lines": default_out.splitlines(),
            "strict_error": strict_err,  # null => strict output == default
            "strict_output_lines": (None if strict_err is not None
                                    else strict_out.splitlines()),
        })
        cases += 1
    n_strict_err = sum(1 for c in out_cases if c["strict_error"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out_cases, f, indent=1, ensure_ascii=False)
    print("wrote %d cases (%d strict-error, %d strict-clean) to %s"
          % (len(out_cases), n_strict_err, len(out_cases) - n_strict_err,
             OUT))


if __name__ == "__main__":
    main()
