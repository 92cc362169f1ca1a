#!/usr/bin/env python3
"""Regenerable leak scan over the repo's source + docs.

The per-round LEAKCHECK.json claims "0 hits across seven categories";
this script IS those seven categories, so the artifact can be
regenerated at any commit instead of hand-bumped:

    python3 tools/leakcheck.py [--round N] > LEAKCHECK.json

Scans tracked text files under src/, tools/, project/, plus build.sbt
and the top-level *.md / *.scala / *.py files. Matches are reported as
"path:line: excerpt". The categories look for anything that is not
public knowledge: internal package imports, non-public URLs/hosts,
storage buckets, slack links, credential-shaped strings, and internal
environment variables.
"""
import json
import re
import subprocess
import sys

CATEGORIES = {
    # imports of non-public namespaces (public = spark/scala/java/json4s/
    # jackson/scalatest/scalacheck/derby and this repo's own `graft`)
    "internal-import": re.compile(
        r"^\s*import\s+(?!graft\.|org\.apache\.|org\.scalatest|org\.scalacheck"
        r"|org\.json4s|com\.fasterxml|scala\.|java\.|javax\.)"
        r"(com|net|io|ai|co)\.[a-z]"),
    # URLs that are not localhost or well-known public hosts
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|github\.com|spark\.apache\.org"
        r"|www\.apache\.org|issues\.apache\.org|arxiv\.org|doi\.org"
        r"|en\.wikipedia\.org|duckdb\.org|docs\.oracle\.com|ckan"
        r"|schemas\.openxmlformats\.org|www\.w3\.org"
        r"|(?:[a-z0-9-]+\.)*example\.(?:com|org|net))"
        r"[a-zA-Z0-9.-]+"),
    # second-level internal package roots that must never appear
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?:anthropic|anthr|internal)\b", re.I),
    # cloud storage buckets / object-store URIs
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[a-zA-Z0-9._-]+"),
    # slack workspaces / channels / short links
    "slack-link": re.compile(r"slack\.com|slack://|#[a-z0-9-]*claude|go/[a-z]{2,}\b"),
    # credential-shaped strings (AWS keys, bearer/API tokens, PEM blocks)
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|-----BEGIN [A-Z ]*PRIVATE KEY-----"
        r"|\b(?:api[_-]?key|secret[_-]?key|bearer)\s*[:=]\s*['\"][A-Za-z0-9+/_-]{16,}"),
    # internal-looking environment variables (public allowlist: SPARK_*,
    # GRAFT_*, DATAPUMP_*, JAVA_*, COURSIER_*, SBT_*, standard shell vars)
    "axon-env": re.compile(
        r"\b(?:ANTHROPIC|AXON|CLAUDE)_[A-Z0-9_]+"),
}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True,
                         check=True).stdout.splitlines()
    keep = []
    for f in out:
        if f == "tools/leakcheck.py":
            continue  # the category regexes match their own definitions
        if f.startswith(("src/", "tools/", "project/")) or \
           f in ("build.sbt",) or \
           (("/" not in f) and f.endswith((".md", ".scala", ".py"))):
            if not f.endswith((".parquet", ".json")):
                keep.append(f)
    return keep


def main():
    rnd = None
    args = sys.argv[1:]
    if len(args) >= 2 and args[0] == "--round":
        rnd = int(args[1])
    hits = {k: [] for k in CATEGORIES}
    for path in tracked_files():
        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                for ln, line in enumerate(fh, 1):
                    for cat, rx in CATEGORIES.items():
                        if rx.search(line):
                            hits[cat].append(f"{path}:{ln}: {line.strip()[:160]}")
        except OSError:
            continue
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    out = {"n_hits": sum(len(v) for v in hits.values()),
           "commit": head,
           "command": "python3 tools/leakcheck.py",
           "hits": hits}
    if rnd is not None:
        out = {"round": rnd, **out}
    json.dump(out, sys.stdout, indent=2)
    print()
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
