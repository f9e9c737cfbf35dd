"""Local replica of the driver's DuckDB-oracle gate: every REGISTRY query
runs on Spark AND DuckDB over the same parquet; row counts, column names and
values must match EXACTLY (the decimal-cast convention makes even float
aggregates bit-identical)."""

import math
import os

import duckdb
import pytest

from pypeln_spark.io import TABLES
from pypeln_spark.queries import REGISTRY, RETIRED

# retired entries leave the driver window, never the local gate: their
# oracles stay replayed every pytest run (retirement policy, r13)
EVERYTHING = {**REGISTRY, **RETIRED}

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def normalize(df):
    """pandas DataFrame → sorted list of row tuples with canonical values."""
    cols = sorted(df.columns)
    df = df[cols]

    def canon(v):
        if v is None:
            return ("null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", repr(v))
        if hasattr(v, "isoformat"):  # datetime/date (tz-naive both sides)
            return ("t", v.isoformat().replace("+00:00", ""))
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return ("a", tuple(canon(x) for x in v))
        if isinstance(v, (int,)) or type(v).__name__.startswith(("int", "uint")):
            return ("i", int(v))
        if type(v).__name__.startswith("float"):
            return canon(float(v))
        if isinstance(v, bytes):
            return ("b", v)
        return ("s", str(v))

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


oracle_queries = [(n, q) for n, q in sorted(EVERYTHING.items()) if q.oracle is not None]


def assert_driver_safe_schema(df, name):
    """The driver canonicalizes outputs with a pandas lexsort; array/map/
    binary top-level columns crash it (numpy.ndarray is unhashable — r1's
    run aborted there, starving 35 later queries of correctness rows).
    Contract: registry outputs are scalar-only; complex state is serialized
    (array_join / to_json) before it leaves a query."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.BinaryType, T.StructType))
    ]
    assert not bad, f"{name}: canonicalizer-hostile output columns {bad}"


@pytest.mark.parametrize("name", [n for n, _ in oracle_queries])
def test_query_matches_oracle(spark, duck, name):
    q = EVERYTHING[name]
    sdf = q.fn(spark, SF_DIR)
    assert_driver_safe_schema(sdf, name)
    got = sdf.toPandas()
    want = duck.sql(q.oracle).df()

    got_cols, got_rows = normalize(got)
    want_cols, want_rows = normalize(want)

    assert got_cols == [c for c in want_cols], f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs oracle {len(want_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(got_rows, want_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run, return a DataFrame, and
    keep their output schema canonicalizer-safe."""
    for name, q in sorted(EVERYTHING.items()):
        if q.oracle is None:
            df = q.fn(spark, SF_DIR)
            assert_driver_safe_schema(df, name)
            assert df.count() >= 0, name


def test_entry_contract():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10


def test_readme_registry_count_matches():
    """README's registry-size claim drifted twice (200→201 in r6, 201→202
    caught by the r7 judge, ADVICE low #1). Pin it: the literal 'holds\\nN
    entries' sentence must carry len(REGISTRY)."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "README.md")).read()
    m = re.search(r"registry holds\s+(\d+) entries", text)
    assert m, "README registry-count sentence missing"
    assert int(m.group(1)) == len(REGISTRY), (m.group(1), len(REGISTRY))


def test_driver_window_rotation_invariants():
    """The driver hash-checks the FIRST 50 registered queries per round;
    r6's hand-pasted _PRIORITY held 55 names and five silently missed the
    window (VERDICT r6 'What's missing' #3). Pin the invariants
    mechanically: the list is EXACTLY window-sized, every name resolves,
    the registry front equals it, and — the property the rotation exists
    for — every query with no driver correctness row yet sits inside the
    window (a new query must be driver-checked in its debut round)."""
    import glob
    import json
    import re

    import pypeln_spark.queries as Q

    window = 50
    assert len(Q._PRIORITY) == window, len(Q._PRIORITY)
    assert len(set(Q._PRIORITY)) == window  # no duplicates eating slots
    unknown = [n for n in Q._PRIORITY if n not in REGISTRY]
    assert unknown == [], unknown
    assert list(REGISTRY)[:window] == Q._PRIORITY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    never = [n for n in REGISTRY if n not in latest]
    outside = [n for n in never if n not in Q._PRIORITY]
    assert outside == [], f"never-driver-checked queries outside the window: {outside}"

    # The ACHIEVABLE freshness invariant (VERDICT r8 #1): with >4×window
    # entries, "nothing older than 3 rounds" is arithmetically impossible;
    # the enforced rule is a 5-round CYCLE. The check is two-phase because
    # the repo legitimately exists in two states:
    #   PRE-RUN (the window was rebuilt for the upcoming round; the newest
    #   CORRECTNESS file does not match it): every entry already 4 rounds
    #   behind the newest file MUST be inside the window — it would hit 5
    #   when that file's successor lands.
    #   POST-RUN (the newest CORRECTNESS file IS this window — the driver
    #   consumed it; the next builder rebuilds before the next run): the
    #   4-rounds-behind cohort is the NEXT window's duty, so only a hard
    #   violation counts — no entry anywhere may be 5+ rounds stale.
    if latest:
        max_round = max(latest.values())
        newest_names = {n for n, r in latest.items() if r == max_round}
        window_ran = set(Q._PRIORITY) <= newest_names
        expired = [
            n for n in REGISTRY
            if n in latest and latest[n] <= max_round - 5
        ]
        assert expired == [], (
            f"entries 5+ rounds driver-stale (cycle broken): {expired}"
        )
        if not window_ran:
            overdue = [
                n for n in REGISTRY
                if n in latest and latest[n] <= max_round - 4
            ]
            missing = [n for n in overdue if n not in Q._PRIORITY]
            assert missing == [], (
                f"entries 4+ rounds driver-stale left out of the window: {missing}"
            )
