#!/usr/bin/env python3
"""Compare two Bench JSON artifacts and flag same-entry swings.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [ratio]

Prints entries whose NEW/OLD ratio exceeds `ratio` (default 2.0) in
either direction, plus totals, entry-set differences, and both runs'
loadavg — the first stop of the PLANS §25 adjudication protocol
before any per-entry isolated re-run. Dev-only tooling; the Scala
library never depends on it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            if line.strip():
                return json.loads(line)
    raise SystemExit(f"{path}: no JSON line")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qo, qn = old["queries"], new["queries"]
    print(f"old: {len(qo)} entries, total {old['value']:.1f}s, "
          f"loadavg {old.get('loadavg', '?')}")
    print(f"new: {len(qn)} entries, total {new['value']:.1f}s, "
          f"loadavg {new.get('loadavg', '?')}")
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    flagged = []
    for k in sorted(set(qo) & set(qn)):
        a, b = qo[k], qn[k]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1.0 / ratio:
            flagged.append((r, k, a, b))
    if not flagged:
        print(f"no same-entry swings beyond {ratio}x")
    for r, k, a, b in sorted(flagged, key=lambda t: -t[0]):
        print(f"  {k:36s} {a:8.2f}s -> {b:8.2f}s  ({r:.2f}x)")
    if new.get("errors"):
        print(f"new errors: {new['errors']}")


if __name__ == "__main__":
    main()
