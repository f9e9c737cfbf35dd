"""A/B: interpreted higher-order dot_ieee fold vs a dim-unrolled flat
expression chain (r14 optimization round).

Hypothesis (guide §1.2 per-task work): F.aggregate/zip_with are
HigherOrderFunction expressions — CodegenFallback in Spark, evaluated
interpreted with per-element lambda-variable binding — while an unrolled
((0.0 + a0*b0) + a1*b1) + ... chain of GetArrayItem/multiply/add runs
inside WholeStageCodegen on primitive doubles. Same IEEE ops in the same
left-fold order, so values must be BIT-identical (asserted here on random
data including sign flips and denormal-ish magnitudes).

Usage: python tools/dot_unroll_ab.py [n_rows] [dim] [runs]
Prints per-arm min seconds to a noop sink and the bit-parity verdict.
"""

from __future__ import annotations

import os
import random
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import functions as F

    from pypeln_spark.session import get_spark

    spark = get_spark(app_name="dot_unroll_ab")
    spark.range(1000).selectExpr("sum(id)").collect()

    # deterministic pseudo-random vectors, derived in-plan so the scan is
    # not the bottleneck: two dim-arrays per row from xxhash64 streams
    base = spark.range(n)
    mk = lambda salt: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.xxhash64(F.col("id") * dim + i + F.lit(salt)) % 2001
        ).cast("double")
        / 1000.0,
    )
    df = base.select(
        F.col("id"), mk(0).alias("va"), mk(7_777_777).alias("vb")
    ).localCheckpoint(eager=True)  # materialize once; both arms read blocks

    def fold(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def unrolled(a, b):
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(a, i) * F.get(b, i)
        return acc

    # bit parity on a sample (includes negatives; products hit ~1e-6..4)
    sample = df.limit(50_000)
    mism = (
        sample.select(
            fold(F.col("va"), F.col("vb")).alias("f"),
            unrolled(F.col("va"), F.col("vb")).alias("u"),
        )
        .filter(
            F.expr(
                "not (cast(f as string) <=> cast(u as string)) "
                "or f <=> null or u <=> null"
            )
        )
        .count()
    )
    # string compare is a weak proxy; do exact bit compare driver-side too
    rows = sample.limit(2000).select(
        fold(F.col("va"), F.col("vb")).alias("f"),
        unrolled(F.col("va"), F.col("vb")).alias("u"),
    ).collect()
    bits = lambda x: struct.pack(">d", x)  # noqa: E731
    bad = sum(1 for r in rows if bits(r.f) != bits(r.u))
    print(f"# parity: plan-side mismatches={mism}, bit-mismatches={bad}/2000")

    def bench(label, col):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df.select((col / 2.0).alias("d")).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {label}: {dt:.3f}s", flush=True)
        return best

    f = bench("fold", fold(F.col("va"), F.col("vb")))
    u = bench("unrolled", unrolled(F.col("va"), F.col("vb")))
    print(
        f"# RESULT rows={n} dim={dim}: fold={f:.3f}s unrolled={u:.3f}s "
        f"speedup={f / u:.2f}x parity_ok={mism == 0 and bad == 0}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    random.seed(0)
    raise SystemExit(main())
