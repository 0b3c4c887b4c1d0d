#!/usr/bin/env python3
"""Round-over-round optimized-plan drift report.

Compares the per-query plan fingerprints two Bench runs wrote to
bench_plans.json (or the `plans` map inside bench_out.json). A changed
sha means the PLAN changed between rounds — a timing delta on an
unchanged sha is environment drift, not a regression to chase in code.

Usage: plan_compare.py OLD.json NEW.json
Exit 0 always (it is a report, not a gate); prints CHANGED / ADDED /
REMOVED sections and a one-line summary.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.loads(f.read().strip().splitlines()[0])
    return doc.get("plans", doc)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return
    old, new = load(sys.argv[1]), load(sys.argv[2])
    changed = sorted(q for q in old.keys() & new.keys() if old[q] != new[q])
    added = sorted(new.keys() - old.keys())
    removed = sorted(old.keys() - new.keys())
    for q in changed:
        print(f"CHANGED {q}: {old[q]} -> {new[q]}")
    for q in added:
        print(f"ADDED   {q}: {new[q]}")
    for q in removed:
        print(f"REMOVED {q}: {old[q]}")
    same = len(old.keys() & new.keys()) - len(changed)
    print(f"{same} unchanged, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")


if __name__ == "__main__":
    main()
