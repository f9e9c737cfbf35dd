"""Cross-engine deterministic hashing primitives.

Every fuzzy-dedup / LSH operator must be *reproducible* — same input, same
buckets, on any engine — or its oracle can't exist and its results can't be
audited. Spark's built-in ``hash()`` (Murmur3) has no DuckDB twin, so the
base hash is md5 (bit-identical everywhere): take the first 15 hex chars
(60 bits, fits a signed int64), parse, reduce mod the Mersenne prime 2^31-1.
All downstream arithmetic ((a*h+b) mod p, bit tricks) then stays inside
int64 with no overflow — a*h < 2^62.

The SQL spellings (``sql_*``) are kept adjacent to the Column spellings so
the two can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

P31 = 2147483647  # Mersenne prime 2^31 - 1

# fixed (a, b) pairs for the minhash family h_j(x) = (a_j*x + b_j) mod P31,
# generated once with seed 20260813 and frozen — part of the on-disk contract
MINHASH_PARAMS = [
    (2128164061, 398802782),
    (596987483, 1147225393),
    (1916785055, 1479347476),
    (972347433, 116450322),
    (291219901, 430979121),
    (234034475, 1406942087),
    (1761180996, 1267685540),
    (924035317, 1172698795),
    (2038977239, 402639405),
    (2143289124, 1357670270),
    (1355823819, 2113210625),
    (668925749, 252657889),
    (1177825180, 428031840),
    (1696544698, 230896653),
    (794664036, 1758809000),
    (1480032976, 858479239),
    (527406851, 106582524),
    (1903391910, 87966394),
    (666804718, 1973199131),
    (490296875, 1423351956),
    (955195196, 331877174),
    (1530448622, 2086450537),
    (890048280, 664594620),
    (970348800, 767008894),
    (2005366380, 811038816),
    (1658406170, 297044272),
    (788724777, 1949869887),
    (1988273003, 1035172614),
    (307572220, 1793558278),
    (961940037, 1524628944),
    (1962834533, 104594903),
    (1989011546, 1619595135),
]


def h31(c: Column) -> Column:
    """String column → deterministic hash in [0, P31). md5-based: bit-equal
    reproducible in ANY engine (the auditable/oracle path)."""
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % F.lit(P31)
    )


def fast_h31(c: Column) -> Column:
    """xxhash64-based hash in [0, P31) — measured ~20× cheaper than h31
    inside higher-order transforms (JVM-native, no hex/string churn).
    Deterministic across Spark runs/clusters but NOT reproducible in other
    engines (no DuckDB twin) — the production scale path; swap in for h31
    when cross-engine auditability isn't required."""
    return F.pmod(F.xxhash64(c), F.lit(P31))


def py_h31(s: str) -> int:
    """Driver-side Python twin of h31 — MUST stay in lockstep with h31()/
    sql_h31(). Used to precompute row-independent constants (e.g. LSH
    hyperplane components) once on the driver instead of per row inside
    interpreted higher-order expressions."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P31


def sql_h31(expr: str) -> str:
    """DuckDB spelling of h31 — MUST stay in lockstep with h31()."""
    return (
        f"(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) % 2147483647)"
    )


def spark_sql_h31(expr: str) -> str:
    """Spark-SQL spelling of h31 (for F.expr-built higher-order pipelines)."""
    return f"(CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT) % 2147483647)"


# -- 60-bit family: the UN-reduced md5 prefix h31 takes its modulus of.
# 15 hex chars = 60 well-mixed bits, positive in a signed 64-bit long on
# both engines (no sign-bit hazard), enough for the wide-band SimHash
# (simhash_near_pairs_wideband needs ≥ bands × band_bits fingerprint
# bits; h31's 31 bits cap byte-banding at the 256-value keys that go
# corpus-quadratic — see ext/dedup.py). Same lockstep contract as h31.


def sql_h60(expr: str) -> str:
    """DuckDB spelling of h60 — MUST stay in lockstep with spark_sql_h60()."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def spark_sql_h60(expr: str) -> str:
    """Spark-SQL spelling of h60 (for F.expr-built higher-order pipelines)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def shingles(c: Column, k: int = 5) -> Column:
    """Distinct k-character shingles of a string column (array<string>).
    Positions are 1-based on both engines; strings shorter than k yield
    a single whole-string shingle."""
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k))
    )


def sql_shingles(expr: str, k: int = 5) -> str:
    """DuckDB spelling of shingles(); substr is 1-based there too."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({expr}) - {k - 1}, 1) + 1), "
        f"i -> substr({expr}, CAST(i AS INT), {k})))"
    )


def shingle_hashes(c: Column, k: int = 5) -> Column:
    """Distinct k-shingle HASHES via a char-code polynomial (no md5):
    h = fold(ascii(char), ×31) mod P31; ascii('') = 0 on both engines covers
    the short-string tail. NOTE: measured ~2× SLOWER than
    transform(shingles, h31) — higher-order exprs run interpreted, so the 16
    nodes/element here beat md5's 6 nodes on cost. Kept as the reference
    implementation of an md5-free hash for engines where that matters."""
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))

    def h(i):
        acc = F.ascii(F.substring(c, i, 1))
        for j in range(1, k):
            acc = acc * F.lit(31) + F.ascii(F.substring(c, i + F.lit(j), 1))
        return acc.cast("long") % F.lit(P31)

    return F.array_distinct(F.transform(F.sequence(F.lit(1), n), h))


def sql_shingle_hashes(expr: str, k: int = 5) -> str:
    """DuckDB spelling of shingle_hashes() — identical arithmetic."""
    acc = f"ascii(substr({expr}, CAST(i AS INT), 1))"
    for j in range(1, k):
        acc = f"({acc} * 31 + ascii(substr({expr}, CAST(i + {j} AS INT), 1)))"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({expr}) - {k - 1}, 1) + 1), "
        f"i -> CAST({acc} AS BIGINT) % 2147483647))"
    )
