#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json from an actual scan of the working tree
(src/main + src/test + build + docs), not an in-place round bump.

Categories mirror the driver's seven buckets. Each pattern flags
content that should never appear in a from-public-knowledge-only repo:
non-public package imports, non-public URLs, cloud bucket URIs,
Slack links/channels, credential-shaped strings, and internal-looking
environment variables.
"""
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SCAN_GLOBS = ["src/**/*.scala", "*.md", "build.sbt", "tools/*.py",
              ".claude/**/*.md"]

# root-package imports outside the public whitelist; local-scope imports
# (`spark.implicits._`, objects defined in this repo) start lowercase or
# with a repo-defined name and are structurally incapable of referencing
# an external system, so only fully-qualified root packages are checked
IMPORT_RE = re.compile(r"^\s*import\s+((?:com|net|io|ai|dev|cloud|internal|corp)\.[\w.]+)", re.M)
IMPORT_ALLOW = re.compile(r"^com\.fasterxml\.|^io\.netty\.")  # in Spark's jars
URL_RE = re.compile(r"https?://[\w.-]+[\w/()#?=&.-]*")
# synthetic fixture hosts used by url-parsing tests/queries
URL_ALLOW = re.compile(r"https?://(ex\.ample|x\.y|example\.(com|org)|a\.b)\b")
BUCKET_ALLOW = {"README.md: s3://models/km"}  # generic path-shape illustration
PUBLIC_HOSTS = re.compile(
    r"https?://(www\.)?("
    r"github\.com|raw\.githubusercontent\.com|spark\.apache\.org|"
    r"apache\.org|arxiv\.org|aclanthology\.org|dl\.acm\.org|"
    r"duckdb\.org|scala-lang\.org|scala-sbt\.org|openjdk\.org|"
    r"docs\.oracle\.com|en\.wikipedia\.org|repo1\.maven\.org|"
    r"proceedings\.neurips\.cc|proceedings\.mlr\.press|"
    r"datatracker\.ietf\.org|www\.ietf\.org|sqlite\.org|"
    r"json\.org|jsonlines\.org|openreview\.net|doi\.org|"
    r"keepachangelog\.com|semver\.org|localhost)")
BUCKET_RE = re.compile(r"\b(s3|s3a|gs|abfss?|axon)://[\w./-]+")
SLACK_RE = re.compile(r"(slack\.com|app\.slack|#[a-z0-9-]*claude[a-z0-9-]*|go/[a-z][a-z0-9-]{1,30}\b)")
KEY_RE = re.compile(r"\b(sk-[A-Za-z0-9]{16,}|AKIA[A-Z0-9]{12,}|ghp_[A-Za-z0-9]{20,}|xox[baprs]-[A-Za-z0-9-]{10,})")
ENV_RE = re.compile(r"\b(AXON_[A-Z_]+|ANTHROPIC_[A-Z_]+|CLAUDE_[A-Z_]+)\b")


def main() -> None:
    hits = {"internal-import": [], "internal-url": [], "internal-pkg2": [],
            "internal-bucket": [], "slack-link": [], "api-key": [],
            "axon-env": []}
    files = sorted({p for g in SCAN_GLOBS for p in ROOT.glob(g)
                    if p.is_file() and p.name != "leakcheck.py"})
    for p in files:
        rel = p.relative_to(ROOT)
        try:
            txt = p.read_text(errors="replace")
        except OSError:
            continue
        if p.suffix == ".scala":
            for m in IMPORT_RE.finditer(txt):
                if not IMPORT_ALLOW.match(m.group(1)):
                    hits["internal-import"].append(f"{rel}: {m.group(1)}")
        for m in URL_RE.finditer(txt):
            if not PUBLIC_HOSTS.match(m.group(0)) \
                    and not URL_ALLOW.match(m.group(0)):
                hits["internal-url"].append(f"{rel}: {m.group(0)}")
        for m in BUCKET_RE.finditer(txt):
            if f"{rel}: {m.group(0)}" not in BUCKET_ALLOW:
                hits["internal-bucket"].append(f"{rel}: {m.group(0)}")
        for m in SLACK_RE.finditer(txt):
            hits["slack-link"].append(f"{rel}: {m.group(1)}")
        for m in KEY_RE.finditer(txt):
            hits["api-key"].append(f"{rel}: {m.group(1)}")
        for m in ENV_RE.finditer(txt):
            hits["axon-env"].append(f"{rel}: {m.group(1)}")
    out = {"round": int(sys.argv[1]) if len(sys.argv) > 1 else 9,
           "n_files_scanned": len(files),
           "n_hits": sum(len(v) for v in hits.values()),
           "hits": hits}
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    print(f"scanned {len(files)} files, {out['n_hits']} hits")


if __name__ == "__main__":
    main()
