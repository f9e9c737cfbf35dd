"""Dump `.explain("formatted")` for registry queries to plans/<tag>/.

The optimization-round evidence channel: for every query touched in an
optimization round, the plan BEFORE and AFTER the change is committed as
plans/<round>/<query>_<suffix>.txt so plan claims ("2 Exchange -> 1",
"SortMergeJoin -> BroadcastHashJoin") are checkable without running Spark.

Usage:
  python tools/dump_plans.py --out plans/r13 --suffix before [name ...]

With no names, dumps every non-streaming registry query (streaming queries
execute eagerly at build time and return a local/checkpoint scan — their
meaningful per-stage plans are captured by their own tools/tests).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("PYPELN_SPARK_PLAN_SF", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pypeln_spark.queries import REGISTRY, RETIRED
    from pypeln_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    everything = {**REGISTRY, **RETIRED}
    names = args.names or [n for n in everything if not n.startswith("streaming_")]
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        q = everything.get(name)
        if q is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        df = q.fn(spark, SF)
        qe = df._jdf.queryExecution()
        text = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF} ({args.suffix})\n")
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
