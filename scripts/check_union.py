#!/usr/bin/env python
"""Union the driver's CORRECTNESS_r*.json artifacts against the live
queries() registry and report each query's LATEST driver evidence —
the staleness bookkeeping the per-round prefix ordering is built on.

Prints one line per status bucket plus the stale backlog in
oldest-first order (the order the next round's prefix should re-green
them), and exits non-zero if any query's LATEST recorded row is red
or if a registry query has never been driver-checked AND is not in
the upcoming 50-row prefix.

Usage: python scripts/check_union.py [--repo /root/repo]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()
    sys.path.insert(0, args.repo)

    import __spark_entry__ as entry

    ordered = list(entry.queries())
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(args.repo, "CORRECTNESS_r*.json"))):
        # match on the basename only — a checkout path containing
        # _r<digits> (e.g. /home/u/repo_r2) must not shadow the
        # artifact's own round number
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            ok = bool(row.get("rows_match")) and bool(
                row.get("schema_match")) and bool(row.get("hash_match"))
            latest[name] = (rnd, ok)

    prefix = set(ordered[:50])
    red, never, by_round = [], [], {}
    for name in ordered:
        if name not in latest:
            never.append(name)
            continue
        rnd, ok = latest[name]
        if not ok:
            red.append((name, rnd))
        by_round.setdefault(rnd, []).append(name)

    print(f"registry queries: {len(ordered)}")
    for rnd in sorted(by_round):
        print(f"  latest-green r{rnd}: {len(by_round[rnd])}")
    print(f"  never driver-checked: {len(never)} "
          f"({sum(1 for n in never if n in prefix)} in the next prefix)")
    if never:
        print("    " + ", ".join(never))
    if red:
        print(f"RED latest rows: {red}")
    stale_rounds = sorted(by_round)[:-1] if len(by_round) > 1 else []
    backlog = [n for r in stale_rounds for n in by_round[r]
               if n not in prefix]
    if backlog:
        print(f"stale backlog outside the next prefix ({len(backlog)}, "
              "oldest first):")
        for r in stale_rounds:
            names = [n for n in by_round[r] if n not in prefix]
            if names:
                print(f"  r{r}: " + ", ".join(names))

    bad_never = [n for n in never if n not in prefix]
    sys.exit(1 if (red or bad_never) else 0)


if __name__ == "__main__":
    main()
