#!/usr/bin/env python3
"""Reproduce SCALE.md's whole-suite plan audit from a graft.Explain dump.

Usage:
    sbt "runMain graft.Explain /root/testdata/sf0.001 /tmp/plans"
    python3 tools/plan_audit.py /tmp/plans

Per query: shuffle-exchange count, broadcast-exchange count, distinct
whole-stage-codegen spans, and a flag for nested-loop/cartesian
fragments. The totals line is the number quoted in SCALE.md.
"""
import os
import re
import sys


def main(plans_dir: str) -> int:
    rows = []
    for f in sorted(os.listdir(plans_dir)):
        if not f.endswith(".txt"):
            continue
        p = open(os.path.join(plans_dir, f)).read()
        rows.append((
            f[:-4],
            len(re.findall(r"\(\d+\) Exchange", p)),
            len(re.findall(r"\(\d+\) BroadcastExchange", p)),
            len(set(re.findall(r"\[codegen id : (\d+)\]", p))),
            "NLJ" if ("NestedLoop" in p or "Cartesian" in p) else "",
        ))
    print(f"{'query':28s} shuf bcast codegen flag")
    for n, e, b, w, x in rows:
        print(f"{n:28s} {e:4d} {b:5d} {w:7d} {x}")
    print(f"\n{len(rows)} queries, {sum(r[1] for r in rows)} shuffle exchanges, "
          f"{sum(1 for r in rows if r[1] == 0)} zero-shuffle, "
          f"{sum(1 for r in rows if r[4])} with nested-loop fragments")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans"))
