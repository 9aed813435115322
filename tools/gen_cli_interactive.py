#!/usr/bin/env python3
"""Interactive-CLI differential corpus generator (test tooling only).

Replays a fixed set of interactive sessions against the LIVE reference
CLI (python -m rbql with stdin piped, the shape the reference's own
test_all.sh:385-420 uses) and records each session's stdout bytes.
CliInteractiveSpec recreates the same fixture files at the same paths
and replays each session through graft.Cli.run, comparing stdout
byte-for-byte — prompts, ANSI color codes, previews, warnings, the
Success line, and loop-exit behavior all included.

Fixture files live at a FIXED path so the transcripts (which embed the
default output path) replay identically on the graft side.
"""
import json, os, shutil, subprocess, sys

REF = "/root/reference/rbql-py"
FIXDIR = "/tmp/graft_cli_ifix"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "../src/test/resources/differential/cli_interactive.json")

FIXTURES = {
    "in.csv": "x,1\ny,2\nz,3\n",
    "named.csv": "name,age\nada,36\nbob,25\ngrace,47\n",
    "ragged.csv": "a,1\nb\nc,3,9\n",
    "joinb.csv": "1,one\n2,two\n7,seven\n",
    "wide.tsv": "k1\tv1\tw1\nk2\tv2\tw2\n",
}

SESSIONS = [
    # the canonical test_all.sh shape: two failing queries, then success
    {"name": "errors_then_success",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv"],
     "stdin": "select select a1\nselect a1, nonexistent_func(a2)\n"
              "select a1, a2 where int(a2) > 1\n"},
    # success on the first query breaks the loop (second line never runs)
    {"name": "first_success_breaks",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv"],
     "stdin": "select a1\nselect a2\n"},
    # empty line exits silently; EOF prints one newline
    {"name": "empty_line_exit",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv"],
     "stdin": "\n"},
    {"name": "eof_exit",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv"],
     "stdin": ""},
    # --with-headers: header row previews unlabeled, data rows labeled
    {"name": "with_headers",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/named.csv",
              "--with-headers"],
     "stdin": "select a.name where int(a.age) > 30\n"},
    # ragged input: sample warning at preview AND after the run
    {"name": "ragged_warnings",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/ragged.csv"],
     "stdin": "select a1\n"},
    # join query through the loop
    {"name": "join_query",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv"],
     "stdin": f"select a1, b2 inner join {FIXDIR}/joinb.csv on a2 == b1\n"},
    # --output provided: no default-path warning, Success names it
    {"name": "explicit_output",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/in.csv",
              "--output", f"{FIXDIR}/explicit_out.csv"],
     "stdin": "select a2, a1\n"},
    # TAB input: default output extension is .tsv
    {"name": "tsv_default_ext",
     "args": ["--delim", "TAB", "--input", f"{FIXDIR}/wide.tsv"],
     "stdin": "select a3, a1\n"},
    # None in output: warning after the successful run, colored
    {"name": "none_warning",
     "args": ["--delim", ",", "--input", f"{FIXDIR}/ragged.csv"],
     "stdin": "select a2\n"},
]


def clean_outputs():
    for f in os.listdir(FIXDIR):
        if f not in FIXTURES:
            p = os.path.join(FIXDIR, f)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    for name, content in FIXTURES.items():
        with open(os.path.join(FIXDIR, name), "w") as f:
            f.write(content)
    cases = []
    env = dict(os.environ, PYTHONPATH=REF)
    for s in SESSIONS:
        clean_outputs()
        r = subprocess.run(
            [sys.executable, "-m", "rbql"] + s["args"],
            input=s["stdin"].encode(), env=env,
            capture_output=True, timeout=120)
        if r.stderr:
            print(f"[gen] NOTE {s['name']}: reference stderr: "
                  f"{r.stderr.decode()!r}", file=sys.stderr)
        cases.append({"name": s["name"], "args": s["args"],
                      "stdin": s["stdin"],
                      "stdout": r.stdout.decode("utf-8"),
                      "exit": r.returncode})
    clean_outputs()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"fixtures": FIXTURES, "cases": cases}, f, indent=1)
    print(f"wrote {len(cases)} interactive sessions to {OUT}")


if __name__ == "__main__":
    main()
