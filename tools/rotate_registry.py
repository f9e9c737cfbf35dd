"""Compute the next driver-window rotation from correctness history.

The driver hash-checks the FIRST 50 registered queries each round
(CORRECTNESS_r{N}.json), while the registry keeps growing — so each round
the front of the registry must rotate toward the queries with the fewest
driver rows. This tool reads every CORRECTNESS_r*.json in the repo root,
classifies each registered query (never-checked < failed-last-seen <
green-long-ago < green-recently), and prints the next ``_PRIORITY`` list
for queries/__init__.py: never-checked first (registration order), then
the stalest greens to re-confirm if slots remain.

Usage: python tools/rotate_registry.py [window_size]   (default 50)
Prints the python list literal to paste, plus a coverage summary.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from pypeln_spark.queries import REGISTRY

    history: dict[str, tuple[int, bool]] = {}  # name -> (last round seen, green?)
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("hash_match") is None)
                and not row.get("err")
            )
            history[name] = (rnd, green)

    names = list(REGISTRY)
    never = [n for n in names if n not in history]
    failed = [n for n in names if n in history and not history[n][1]]
    greens = sorted(
        (n for n in names if n in history and history[n][1]),
        key=lambda n: history[n][0],  # stalest first
    )
    front = (never + failed + greens)[:window]

    print(f"# registry: {len(names)} | never-checked: {len(never)} | "
          f"failed-last-seen: {len(failed)} | ever-green: {len(greens)}")
    print(f"# next front-{window} (paste as _PRIORITY in queries/__init__.py):")
    print("_PRIORITY = [")
    for n in front:
        tag = ("never" if n in never else
               "FAILED" if n in failed else f"green r{history[n][0]}")
        print(f'    "{n}",  # {tag}')
    print("]")
    leftover = len(never) - len([n for n in front if n in never])
    if leftover > 0:
        print(f"# NOTE: {leftover} never-checked queries still outside the "
              f"window — they lead the following round's rotation.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
