"""Round-over-round bench comparison.

The driver's BENCH_r{N}.json files sometimes hold only a truncated tail
of the stderr buffer (r8: `"parsed": null`, 55 of 95 per-query lines
recoverable), and bench.py's own output is one JSON line — so every
round the like-for-like comparison was re-derived by hand. This tool
does it mechanically: give it two bench records (either a bench.py
output line or a driver BENCH_r*.json with a `tail` buffer) and it
prints the common-query totals, the ratio, and the biggest movers both
ways.

Usage: python tools/bench_compare.py OLD NEW [top_n]
One JSON line on stdout; the movers table on stderr.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    """Per-query seconds from either format."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except ValueError:
        # maybe a log file whose last line is the bench JSON
        d = json.loads(raw.strip().splitlines()[-1])
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if "tail" in d:  # driver record with a truncated stderr buffer
        # Anchor to the "queries" OBJECT, not a sibling-key denylist
        # (ADVICE r9 #5 — a future numeric top-level key would be
        # misparsed as a query timing). Two truncation shapes exist:
        # the opener survived (scan from it to its closing brace), or
        # the buffer starts MID-object (scan from the buffer start to
        # the first closing brace).
        tail = d["tail"]
        m = re.search(r'"queries":\s*\{', tail)
        body = tail[m.end():] if m else tail
        body = body.split("}", 1)[0]
        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', body)
        return {k: float(v) for k, v in pairs}
    raise SystemExit(f"{path}: no 'queries' dict or 'tail' buffer")


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    s_old = sum(old[k] for k in common)
    s_new = sum(new[k] for k in common)
    movers = sorted(common, key=lambda k: new[k] / max(old[k], 0.01))
    print(f"# common={len(common)}  old={s_old:.1f}s  new={s_new:.1f}s  "
          f"ratio={s_new / s_old:.2f}x", file=sys.stderr)
    for title, names in (("faster", movers[:top_n]),
                         ("slower", movers[-top_n:][::-1])):
        print(f"# {title}:", file=sys.stderr)
        for k in names:
            print(f"#   {k}: {old[k]:.2f} -> {new[k]:.2f} "
                  f"({new[k] / max(old[k], 0.01):.2f}x)", file=sys.stderr)
    print(json.dumps({
        "metric": "bench_compare",
        "common": len(common),
        "old_sec": round(s_old, 1),
        "new_sec": round(s_new, 1),
        "ratio": round(s_new / s_old, 3),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
    }))


if __name__ == "__main__":
    main()
