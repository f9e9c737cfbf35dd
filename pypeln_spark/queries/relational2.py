"""Advanced relational coverage: subqueries, grouping sets, array functions,
unpivot, manual medians, multi-hop analytical joins, plus rows-only entries
for the genuinely non-SQL-expressible paths (async task mode, pickled
payloads). Same decimal-determinism discipline as relational.py.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pypeln_spark import relational as R
from pypeln_spark.functions import dsum, dsum_expr
from pypeln_spark.ext.hashing import MINHASH_PARAMS, sql_h31

from .base import register, tables


@register(
    "subquery_orders_above_avg",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT {dsum_expr('o_totalprice')} / CAST(COUNT(*) AS DOUBLE) FROM orders)
    """,
)
def subquery_orders_above_avg(spark, sf_dir):
    """Scalar subquery (avg computed via the deterministic decimal path).
    Catalyst evaluates the subquery once and broadcasts the scalar."""
    (orders,) = tables(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) FROM orders)
        """
    )


@register(
    "correlated_max_quantity_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem l1
    WHERE l_quantity = (
      SELECT MAX(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def correlated_max_quantity_items(spark, sf_dir):
    """Correlated subquery (groupwise max) — expressed as a window max, the
    one-shuffle formulation Catalyst can't always derive from the correlated
    form."""
    (li,) = tables(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("_mx", F.max("l_quantity").over(w))
        .filter(F.col("l_quantity") == F.col("_mx"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


@register(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_expr('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS through the SQL surface (pl.sql passthrough) —
    one Expand pass, like rollup/cube."""
    (orders,) = tables(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "array_function_gauntlet",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(string_split(text, ' '))[2:4], '|')
             AS second_to_fourth_sorted,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           CAST(coalesce(list_position(string_split(text, ' '), 'query'), 0) AS BIGINT)
             AS query_pos,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
             AS first5_vocab
    FROM documents
    """,
)
def array_function_gauntlet(spark, sf_dir):
    """Array ops: sort, slice, contains, position, distinct, join — all
    codegen'd JVM expressions. Array-typed outputs are flattened to strings
    so the cross-engine value hash never depends on list-repr details."""
    (docs,) = tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(F.sort_array(toks), 2, 3), "|").alias("second_to_fourth_sorted"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "query").cast("long").alias("query_pos"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), "|").alias(
            "first5_vocab"
        ),
    )


@register(
    "unpivot_order_status_counts",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, status, n FROM (
      SELECT o_orderpriority, 'O' AS status, o_cnt AS n FROM p
      UNION ALL SELECT o_orderpriority, 'F', f_cnt FROM p
      UNION ALL SELECT o_orderpriority, 'P', p_cnt FROM p)
    """,
)
def unpivot_order_status_counts(spark, sf_dir):
    """Pivot → unpivot round trip: wide counts back to long form via stack
    (Spark's unpivot primitive)."""
    (orders,) = tables(spark, sf_dir, "orders")
    wide = R.pivot(
        orders, by=["o_orderpriority"], pivot_col="o_orderstatus",
        values=["O", "F", "P"], agg_col=F.count(F.lit(1)),
    ).df.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', O, 'F', F, 'P', P) AS (status, n)",
    )


@register(
    "manual_median_price_by_priority",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / 2 AS median_price
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY o_orderpriority
    """,
)
def manual_median_price_by_priority(spark, sf_dir):
    """Exact median per group WITHOUT percentile(): rank + pick the middle
    one/two rows. Engine-interpolation (a+(b-a)*f vs a(1-f)+bf) differs in
    the last ulp between engines, so the portable median sums the two middle
    values decimally and halves — deterministic everywhere. Also the
    formulation that scales: one shuffle, no full sort-per-group collect."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wc = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        | (F.col("rn") == ((F.col("n") + 2) / 2).cast("long"))
    )
    return R.agg(
        mid,
        by=["o_orderpriority"],
        aggs={"median_price": (dsum("o_totalprice") / 2)},
    ).df


@register(
    "cheapest_item_supplier_per_part",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey, l_suppkey, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice, l_suppkey) AS rn
      FROM lineitem)
    SELECT r.l_partkey, r.l_suppkey, r.l_extendedprice, s.s_name
    FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE rn = 1
    """,
)
def cheapest_item_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part): window-rank then
    broadcast-join the supplier dimension."""
    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    ranked = R.window_rank(
        li.select("l_partkey", "l_suppkey", "l_extendedprice"),
        partition_by=["l_partkey"],
        order_by=[F.col("l_extendedprice").asc(), F.col("l_suppkey").asc()],
        k=1,
    )
    j = R.join(
        ranked.df.drop("rn"), supp, F.col("l_suppkey") == F.col("s_suppkey"), broadcast=True
    )
    return j.df.select("l_partkey", "l_suppkey", "l_extendedprice", "s_name")


@register(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: cross-nation trade volume by year — two aliased
    broadcast joins of the same dimension."""
    li, orders, cust, supp, nation = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return R.agg(
        j.withColumn("ship_year", F.year("l_shipdate")),
        by=["supp_nation", "cust_nation", "ship_year"],
        aggs={"volume": dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))},
    ).df


@register(
    "not_in_parts_never_shipped",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
)
def not_in_parts_never_shipped(spark, sf_dir):
    """NOT IN over a non-null key column ≡ anti join (with nullable keys the
    SQL three-valued semantics would differ — keys here are non-null)."""
    part, li = tables(spark, sf_dir, "part", "lineitem")
    return R.anti_join(part, li.select("l_partkey"), F.col("p_partkey") == F.col("l_partkey")).df.select(
        "p_partkey", "p_name"
    )


# --- rows-only entries (genuinely non-SQL-expressible paths) --------------


@register(
    "pipeline_task_async_enrich",
    oracle="SELECT doc_id * 2 + 1 AS value FROM documents",
)
def pipeline_task_async_enrich(spark, sf_dir):
    """Task-mode async pipeline over table data: asyncio fns with a
    per-partition event loop + semaphore (the reference's 1000-worker IO
    story, task/worker.py:217-244). The enrich function is deterministic
    (doc_id*2+1), so despite running through the async harness it has an
    exact SQL twin — async scheduling must not change values."""
    import asyncio

    import pypeln_spark as pl
    from pypeln_spark.stage import Stage
    from pypeln_spark.utils import VALUE_COL

    (docs,) = tables(spark, sf_dir, "documents")
    scalar = Stage(docs.select(F.col("doc_id").alias(VALUE_COL)))

    async def enrich(doc_id):
        await asyncio.sleep(0)  # stand-in for an IO call
        return doc_id * 2 + 1

    return pl.task.map(enrich, scalar, workers=64, returns="long").df


@register(
    "pipeline_pickled_objects",
    oracle="""
    SELECT doc_id AS value
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100)
    WHERE doc_id % 2 = 0
    """,
)
def pipeline_pickled_objects(spark, sf_dir):
    """Opaque-Python-object pipeline (the reference's anything-goes payload
    contract): dict payloads ride the pickled BinaryType fallback through
    map/filter and come back typed. The fixture is the first 100 doc_ids in
    key order (deterministic), so the surviving ids have an exact SQL twin;
    only the scalar value column is returned — the from_iterable `_index`
    bookkeeping column broke the driver canonicalizer in r1."""
    import pypeln_spark as pl
    from pypeln_spark.utils import VALUE_COL

    (docs,) = tables(spark, sf_dir, "documents")
    rows = [
        {"doc_id": r.doc_id, "meta": (r.lang, r.source)}
        for r in docs.select("doc_id", "lang", "source").orderBy("doc_id").limit(100).collect()
    ]
    stage = (
        pl.from_iterable(rows, spark=spark)
        | pl.map(lambda d: {**d, "tagged": d["meta"][0] == "en"})
        | pl.filter(lambda d: d["doc_id"] % 2 == 0)
        | pl.map(lambda d: d["doc_id"], returns="long")
    )
    return stage.df.select(VALUE_COL)


@register(
    "window_navigation_gauntlet",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS spend_quartile,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           lead(o_orderkey, 1, -1) OVER w AS next_order,
           lag(o_orderkey, 1, -1) OVER w AS prev_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_navigation_gauntlet(spark, sf_dir):
    """Window navigation: ntile / first_value / last_value (full frame) /
    lead / lag with defaults — all deterministic under the orderkey
    tiebreak; one shuffle on the partition key serves every function."""
    from pyspark.sql import Window

    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_order"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_order"),
    )


@register(
    "listagg_region_nations",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, '|' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def listagg_region_nations(spark, sf_dir):
    """Ordered string aggregation: collect_list is unordered in a
    distributed agg, so determinism comes from sort_array before the join —
    the portable LISTAGG."""
    region, nation = tables(spark, sf_dir, "region", "nation")
    j = nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        j.groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "stats_moments_by_event_type",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_value,
           (CAST(SUM(CAST(value * value AS DECIMAL(38,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             - pow(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
             AS var_pop,
           sqrt((CAST(SUM(CAST(value * value AS DECIMAL(38,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             - pow(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2))
             AS stddev_pop
    FROM events GROUP BY event_type
    """,
)
def stats_moments_by_event_type(spark, sf_dir):
    """Population variance/stddev from decimal moment sums (E[x²]−E[x]²) —
    the engines' native var_pop/stddev implementations accumulate doubles in
    engine-specific orders, so reproducible statistics come from exact
    moments + identical IEEE double arithmetic on both sides."""
    (events,) = tables(spark, sf_dir, "events")
    s1 = F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(38,9)")).cast("double")
    n = F.count(F.lit(1)).cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (s1 / n).alias("mean_value"),
            ((s2 / n) - F.pow(s1 / n, F.lit(2))).alias("var_pop"),
            F.sqrt((s2 / n) - F.pow(s1 / n, F.lit(2))).alias("stddev_pop"),
        )
    )


@register(
    "skew_salted_event_totals",
    oracle=f"""
    SELECT n.n_name AS nation, COUNT(*) AS n_events,
           {dsum_expr('e.value')} AS total_value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY 1
    """,
)
def skew_salted_event_totals(spark, sf_dir):
    """Skew-mitigated join, end-to-end: the fact side is salted over 16
    sub-keys and the (small) dim side replicated ×16, so one pathological
    hot key spreads across 16 tasks instead of stalling one. Salting is
    pure plumbing — the oracle is the plain join, results must be
    identical. (AQE skew-split only handles post-shuffle SMJ; salting is
    the general tool.)"""
    from pypeln_spark import relational as R

    events, nation = tables(spark, sf_dir, "events", "nation")
    left = events.withColumn("n_nationkey", (F.col("user_id") % 25).cast("long"))
    joined = R.salted_join(left, nation, on="n_nationkey", salts=16).df
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register(
    "sketch_kmv_distinct_users",
    oracle=f"""
    WITH hh AS (
      SELECT event_type, {sql_h31("CAST(user_id AS VARCHAR)")} AS h FROM events
    ),
    sk AS (
      SELECT event_type, list_slice(list_sort(list(DISTINCT h)), 1, 64) AS kmin
      FROM hh GROUP BY event_type
    ),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
    SELECT s.event_type, array_to_string(s.kmin, ',') AS kmin_csv,
           CASE WHEN len(s.kmin) < 64 THEN CAST(len(s.kmin) AS DOUBLE)
                ELSE CAST(135291469761 AS DOUBLE) / CAST(s.kmin[64] AS DOUBLE)
           END AS est_distinct,
           ex.n_exact
    FROM sk s JOIN ex USING (event_type)
    """,
)
def sketch_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-count sketch (k=64) per event_type, estimate AND sketch
    state both value-checked against the oracle (HLL can't be — no shared
    spec across engines; KMV over the frozen hash family can). Spark side
    runs the true two-phase shape: partial sub-sketches per salt sub-key,
    lossless k-min merge — result provably independent of partitioning.

    The sketch state is serialized to a csv string for the driver check:
    array-typed output columns crash the driver's pandas canonicalizer
    (VERDICT r1 — numpy.ndarray is unhashable in a lexsort), so arrays stay
    internal to ext/sketch.py and registry outputs are scalars only."""
    from pypeln_spark.ext import sketch as K

    (events,) = tables(spark, sf_dir, "events")
    sk = K.kmv_sketch(events, ["event_type"], "user_id", k=64)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        F.array_join("kmin", ",").alias("kmin_csv"),
        "est_distinct",
        "n_exact",
    )


_CMS_D, _CMS_W = 4, 256
_CMS_PARAMS = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS[:_CMS_D])
)


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH p(j, pa, pb) AS (VALUES {_CMS_PARAMS}),
    hh AS (
      SELECT event_type, user_id,
             {sql_h31("CAST(user_id AS VARCHAR)")} AS h
      FROM events
    ),
    bk AS (
      SELECT event_type, user_id, j,
             ((CAST(pa AS BIGINT) * h + pb) % 2147483647) % {_CMS_W} AS b
      FROM hh CROSS JOIN p
    ),
    c AS (
      SELECT event_type, j, b, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bk GROUP BY 1, 2, 3
    ),
    t AS (
      SELECT event_type, user_id, n_true FROM (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_true,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type
                 ORDER BY COUNT(*) DESC, user_id) AS rn
        FROM events GROUP BY 1, 2
      ) WHERE rn <= 3
    ),
    tb AS (
      SELECT DISTINCT t.event_type, t.user_id, t.n_true, bk.j, bk.b
      FROM t JOIN bk ON t.event_type = bk.event_type
                    AND t.user_id = bk.user_id
    )
    SELECT tb.event_type, tb.user_id, tb.n_true,
           CAST(MIN(c.cnt) AS BIGINT) AS n_est
    FROM tb JOIN c ON tb.event_type = c.event_type
                  AND tb.j = c.j AND tb.b = c.b
    GROUP BY 1, 2, 3
    """,
)
def sketch_cms_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters: per event_type, the exact top-3 users by
    event count alongside their CMS point estimate (d=4, w=256). The sketch
    is linear (counter-wise sums), so the estimate is fully deterministic
    under any partitioning and value-checks against the oracle — unlike
    engine-native approx frequency functions, which have no cross-engine
    spec. Sketch build is a bounded-cardinality groupBy (|groups|*d*w keys);
    the estimate join broadcasts the one-row-per-group sketch."""
    from pypeln_spark.ext import sketch as K

    (events,) = tables(spark, sf_dir, "events")
    sk = K.cms_sketch(events, ["event_type"], "user_id", d=_CMS_D, w=_CMS_W)
    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    top = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("n_true"), F.asc("user_id")
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
    return K.cms_estimate(sk, top, ["event_type"], "user_id", d=_CMS_D, w=_CMS_W)


def _hll_oracle() -> str:
    from pypeln_spark.ext.sketch import sql_hll_sketch

    inner = sql_hll_sketch("events", "event_type", "user_id", group_alias="event_type")
    return f"""
    WITH hll AS ({inner}),
    ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM events GROUP BY 1)
    SELECT hll.event_type, hll.hll_sum_pow, hll.empty_buckets,
           hll.est_distinct, ex.n_exact
    FROM hll JOIN ex USING (event_type)
    """


@register("sketch_hll_distinct_users", oracle=_hll_oracle())
def sketch_hll_distinct_users(spark, sf_dir):
    """HyperLogLog distinct users per event_type — the bounded-state distinct
    sketch (256 registers/group vs KMV's O(distinct) buffers), value-checked
    cross-engine because rho/registers derive from md5 hex chars and the
    harmonic sum is carried as an exact integer (ext/sketch.py banner). The
    linear-counting branch reads a Python-precomputed ln table embedded as
    the same literals in both plans, so libm never runs engine-side.

    Scale: one groupBy over (group, bucket) — map-side partial max() bounds
    the shuffle at |groups|*256 rows regardless of input; this is the shape
    you'd run on 100 TB where KMV's collect_set buffers would spill."""
    from pypeln_spark.ext import sketch as K

    (events,) = tables(spark, sf_dir, "events")
    sk = K.hll_sketch(events, ["event_type"], "user_id")
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return sk.join(exact, "event_type").select(
        "event_type", "hll_sum_pow", "empty_buckets", "est_distinct", "n_exact"
    )


@register(
    "sketch_quantile_doc_lengths",
    oracle=f"""
    WITH s AS (
      SELECT lang, {sql_h31("CAST(doc_id AS VARCHAR)")} AS h, n_chars
      FROM documents
    ),
    r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, n_chars) AS rn
      FROM s
    ),
    sv AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS vr,
             COUNT(*) OVER (PARTITION BY lang) AS m
      FROM r WHERE rn <= 128
    ),
    q AS (
      SELECT lang,
             CAST(MAX(m) AS BIGINT) AS m_sample,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.5 * m) AS BIGINT))
                 THEN n_chars END) AS est_p50,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.9 * m) AS BIGINT))
                 THEN n_chars END) AS est_p90
      FROM sv GROUP BY lang
    ),
    ex AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    )
    SELECT q.lang, q.m_sample, q.est_p50, q.est_p90, ex.n_docs
    FROM q JOIN ex USING (lang)
    """,
)
def sketch_quantile_doc_lengths(spark, sf_dir):
    """Quantile sketch via bottom-k uniform row sampling: per lang, p50/p90
    of document length estimated from the 128 docs whose doc_id hashes
    smallest. Rank-pick estimator (no interpolation) + the frozen hash family
    make the estimates bit-identical cross-engine — the auditable stand-in
    for approx_percentile/t-digest, whose spec no two engines share. Same
    lossless two-phase partial/final merge shape as the KMV sketch."""
    from pypeln_spark.ext import sketch as K

    (docs,) = tables(spark, sf_dir, "documents")
    sk = K.bottomk_quantiles(
        docs, ["lang"], "doc_id", "n_chars", k=128, probs=(0.5, 0.9)
    )
    exact = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return sk.join(exact, "lang")


@register(
    "sketch_quantile_global_histogram",
    oracle=f"""
    WITH s AS (
      SELECT {sql_h31("CAST(doc_id AS VARCHAR)")} AS h, n_chars
      FROM documents
    ),
    r AS (
      SELECT n_chars, ROW_NUMBER() OVER (ORDER BY h, n_chars) AS rn
      FROM s
    ),
    sv AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars) AS vr,
             COUNT(*) OVER () AS m
      FROM r WHERE rn <= 256
    ),
    q AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m_sample,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.25 * m) AS BIGINT))
                 THEN n_chars END) AS est_p25,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.5 * m) AS BIGINT))
                 THEN n_chars END) AS est_p50,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.75 * m) AS BIGINT))
                 THEN n_chars END) AS est_p75,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.9 * m) AS BIGINT))
                 THEN n_chars END) AS est_p90
      FROM sv
    )
    SELECT q.m_sample, q.est_p25, q.est_p50, q.est_p75, q.est_p90,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows
    FROM q
    """,
)
def sketch_quantile_global_histogram(spark, sf_dir):
    """GLOBAL quantile sketch — the mergeable companion the equi-depth
    histogram promised (histogram_equi_depth_by_type partitions by type;
    this is the no-partition global form, where NTILE would funnel the
    whole table through one task). Same bottom-k row sample as
    sketch_quantile_doc_lengths with group_cols=[]: per-(salt) bottom-k
    partials merge losslessly into ONE 256-row sample, so the global
    p25/p50/p75/p90 edges cost a constant-state two-phase aggregate
    regardless of table size, and the rank-pick estimator stays
    bit-identical cross-engine. Partition-invariance is pinned in
    tests/test_ext.py."""
    from pypeln_spark.ext import sketch as K

    (docs,) = tables(spark, sf_dir, "documents")
    sk = K.bottomk_quantiles(
        docs, [], "doc_id", "n_chars", k=256, probs=(0.25, 0.5, 0.75, 0.9)
    )
    # one-row × one-row broadcast join (scalar-aggregate pattern, in the
    # lint's ALLOW_BNLJ like sketch_quantile_doc_lengths's exact-count side)
    n = docs.agg(F.count(F.lit(1)).alias("n_rows"))
    return sk.crossJoin(F.broadcast(n))


_BUCKETED_READY: set = set()


def _ensure_bucketed_tables(spark, sf_dir: str) -> tuple:
    """Write-once hash-bucketed twins of orders/lineitem on the join key —
    the co-location build step a warehouse pays ONCE so every later
    order-grain join/agg skips its shuffle. Memoized per (session, sf)."""
    import pypeln_spark as pl

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
    if names not in _BUCKETED_READY:
        # a fresh session's in-memory catalog doesn't know tables a PREVIOUS
        # process left in the warehouse dir, and saveAsTable refuses a
        # colliding location — drop both layers before (re)building
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in names:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        orders, li = tables(spark, sf_dir, "orders", "lineitem")
        pl.write_bucketed(
            orders.select("o_orderkey", "o_orderpriority"),
            names[0], "o_orderkey", n_buckets=8, sort_cols="o_orderkey",
        )
        pl.write_bucketed(
            li.select("l_orderkey", "l_extendedprice", "l_discount"),
            names[1], "l_orderkey", n_buckets=8, sort_cols="l_orderkey",
        )
        _BUCKETED_READY.add(names)
    return names


@register(
    "bucketed_join_priority_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_priority_revenue(spark, sf_dir):
    """CO-LOCATED big-big join via table BUCKETING — the amortized-shuffle
    primitive for fact-to-fact joins where neither side broadcasts:
    orders and lineitem are written ONCE as hash-bucketed tables on the
    order key (8 buckets, sorted within bucket), after which the
    order-grain sort-merge join reads matching buckets directly — ZERO
    Exchange in the join plan (pinned by a plan contract), and the
    in-bucket sort order feeds SMJ without re-sorting. At 100 TB the
    bucket count scales with data (buckets ≈ data / target-partition
    size); the write-side shuffle is paid once and every downstream
    order-keyed join/groupBy rides free. The merge hint keeps the demo
    honest at test SF (AQE would otherwise broadcast the small side —
    at real scale neither side fits)."""
    bo, bl = _ensure_bucketed_tables(spark, sf_dir)
    orders = spark.table(bo)
    li = spark.table(bl)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        li.hint("merge")
        .join(orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


BLOOM_M, BLOOM_KH = 8192, 3
_BLOOM_PARAMS = ", ".join(f"({a}, {b})" for a, b in MINHASH_PARAMS[:BLOOM_KH])
_BLOOM_KEY_FILTER = "l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1998-01-01'"


@register(
    "sketch_bloom_filter_probe",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT l_partkey FROM lineitem WHERE {_BLOOM_KEY_FILTER}
    ),
    kh AS (SELECT l_partkey, {sql_h31("CAST(l_partkey AS VARCHAR)")} AS h FROM keys),
    bparams(a, b) AS (VALUES {_BLOOM_PARAMS}),
    bits AS (
      SELECT DISTINCT ((a * h + b) % 2147483647) % {BLOOM_M} AS bit
      FROM kh CROSS JOIN bparams
    ),
    ph AS (SELECT p_partkey, {sql_h31("CAST(p_partkey AS VARCHAR)")} AS h FROM part),
    ppos AS (
      SELECT p_partkey, ((a * h + b) % 2147483647) % {BLOOM_M} AS bit
      FROM ph CROSS JOIN bparams
    ),
    maybe AS (
      SELECT p_partkey FROM ppos JOIN bits USING (bit)
      GROUP BY p_partkey HAVING COUNT(*) = {BLOOM_KH}
    )
    SELECT CAST({BLOOM_M} AS BIGINT) AS m,
           CAST({BLOOM_KH} AS BIGINT) AS n_hashes,
           (SELECT COUNT(*) FROM keys) AS n_keys,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           (SELECT COUNT(*) FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM keys)) AS n_true_members,
           (SELECT COUNT(*) FROM maybe) AS n_maybe_members,
           (SELECT COUNT(*) FROM maybe) -
           (SELECT COUNT(*) FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM keys)) AS n_false_positives
    """,
)
def sketch_bloom_filter_probe(spark, sf_dir):
    """Bloom-filter membership sketch (ext/sketch.bloom_build /
    bloom_maybe_contains): build an m=8192-bit, 3-hash filter over the
    part keys returned in 1998, probe the whole part table, and report the
    exact false-positive tally against true membership. The frozen hash
    family makes the filter — and each individual probe verdict — fully
    replayable in SQL. Scale: the bit set is ≤ m ints (64 KB broadcast)
    regardless of build-side size; probing is a narrow scan-speed
    projection — the classic pre-filter that spares an anti-join shuffle."""
    from pypeln_spark.ext import sketch as K

    li, part = tables(spark, sf_dir, "lineitem", "part")
    keys = (
        li.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_shipdate") >= "1998-01-01")
        )
        .select("l_partkey")
        .distinct()
    )
    bits = K.bloom_build(keys, "l_partkey", m=BLOOM_M, kh=BLOOM_KH)
    probed = K.bloom_maybe_contains(part, bits, "p_partkey", m=BLOOM_M, kh=BLOOM_KH)
    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    n_bits = bits.select(F.size("bits").cast("long").alias("n_bits_set"))
    n_true = (
        part.join(keys, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("n_true_members"))
    )
    n_maybe = probed.agg(
        F.sum(F.col("maybe_member").cast("long")).alias("n_maybe_members")
    )
    return (
        n_keys.join(F.broadcast(n_bits))
        .join(F.broadcast(n_true))
        .join(F.broadcast(n_maybe))
        .select(
            F.lit(BLOOM_M).cast("long").alias("m"),
            F.lit(BLOOM_KH).cast("long").alias("n_hashes"),
            "n_keys",
            "n_bits_set",
            "n_true_members",
            "n_maybe_members",
            (F.col("n_maybe_members") - F.col("n_true_members")).alias(
                "n_false_positives"
            ),
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    outdeg AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_out
      FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           CAST(t.n AS DOUBLE) / CAST(o.n_out AS DOUBLE) AS p
    FROM trans t JOIN outdeg o ON o.prev_type = t.prev_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order user-journey transition matrix: per-user event streams
    ordered by (ts, event_id) — a total order, so LAG is deterministic —
    yield (prev_type → next_type) bigram counts and row-normalized
    transition probabilities (one exact-integer division each). The
    sequence-model view of the events table that funnels/sessionization
    don't give. Scale: one window shuffle on user_id (sequences stay
    within their partition), then partial-aggregated counts on the tiny
    type-pair key space and a broadcast-sized out-degree join."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    outdeg = trans.groupBy("prev_type").agg(F.sum("n").alias("n_out"))
    return trans.join(F.broadcast(outdeg), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("n_out").cast("double")).alias("p"),
    )


_KMV_M = 63 * 2147483647  # (k-1) * P31 for k = 64


@register(
    "sketch_kmv_overlap_users",
    oracle=f"""
    WITH hh AS (
      SELECT event_type, {sql_h31("CAST(user_id AS VARCHAR)")} AS h FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    sk AS (
      SELECT event_type, list_slice(list_sort(list(DISTINCT h)), 1, 64) AS kmin
      FROM hh GROUP BY event_type
    ),
    two AS (
      SELECT (SELECT kmin FROM sk WHERE event_type = 'view') AS ka,
             (SELECT kmin FROM sk WHERE event_type = 'purchase') AS kb
    ),
    comb AS (
      SELECT ka, kb,
             list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, 64) AS cm
      FROM two
    ),
    est AS (
      SELECT
        CAST(len(list_filter(cm,
              x -> list_contains(ka, x) AND list_contains(kb, x))) AS BIGINT)
          AS inter_in_sketch,
        CASE WHEN len(cm) < 64 THEN CAST(len(cm) AS DOUBLE)
             ELSE CAST({_KMV_M} AS DOUBLE) / CAST(cm[64] AS DOUBLE)
        END AS union_est,
        CAST(len(list_filter(cm,
              x -> list_contains(ka, x) AND list_contains(kb, x))) AS DOUBLE)
          / CAST(len(cm) AS DOUBLE) AS jaccard_est
      FROM comb
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_inter_exact FROM (
        SELECT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
    )
    SELECT e.inter_in_sketch, e.jaccard_est, e.union_est,
           e.jaccard_est * e.union_est AS overlap_est, x.n_inter_exact
    FROM est e CROSS JOIN exact x
    """,
)
def sketch_kmv_overlap_users(spark, sf_dir):
    """KMV set ALGEBRA: estimate the overlap of two user sets (viewers ∩
    purchasers) from their bottom-64 sketches alone — combined sketch =
    bottom-k of the union, Jaccard = fraction of the combined sketch in
    both, overlap = Jaccard × union estimate. The sketch-join every
    audience-overlap / cross-corpus dashboard runs without touching raw
    ids twice; both sketches, the combination rule, and the estimates are
    value-checked (the exact intersection rides along for reference).
    Scale: each side is the standard two-phase KMV build; the set algebra
    happens on two 64-long arrays."""
    from pypeln_spark.ext import sketch as K

    (events,) = tables(spark, sf_dir, "events")
    two = events.filter(F.col("event_type").isin("view", "purchase"))
    sk = K.kmv_sketch(two, ["event_type"], "user_id", k=64)
    ka = sk.filter(F.col("event_type") == "view").select(F.col("kmin").alias("ka"))
    kb = sk.filter(F.col("event_type") == "purchase").select(
        F.col("kmin").alias("kb")
    )
    cm = F.slice(F.array_sort(F.array_distinct(F.concat("ka", "kb"))), 1, 64)
    in_both = F.size(
        F.filter(
            F.col("cm"),
            lambda x: F.array_contains(F.col("ka"), x)
            & F.array_contains(F.col("kb"), x),
        )
    ).cast("long")
    union_est = F.when(
        F.size("cm") < 64, F.size("cm").cast("double")
    ).otherwise(F.lit(float(_KMV_M)) / F.element_at("cm", 64).cast("double"))
    exact = (
        events.filter(F.col("event_type") == "view")
        .select("user_id")
        .intersect(
            events.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_inter_exact"))
    )
    return (
        ka.join(F.broadcast(kb))
        .withColumn("cm", cm)
        .withColumn("inter_in_sketch", in_both)
        .withColumn("jaccard_est", F.col("inter_in_sketch").cast("double") / F.size("cm").cast("double"))
        .withColumn("union_est", union_est)
        .withColumn("overlap_est", F.col("jaccard_est") * F.col("union_est"))
        .join(F.broadcast(exact))
        .select(
            "inter_in_sketch", "jaccard_est", "union_est", "overlap_est",
            "n_inter_exact",
        )
    )
