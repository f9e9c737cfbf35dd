"""Relational suite — joins, aggregations, windows, set ops, top-k, pivot,
rollup/cube, scalar functions, JSON, sessionization.

All beyond-reference capability (SURVEY.md §2.2 lists every category as
'none' in the reference); built on pypeln_spark.relational so Catalyst owns
the physical plan. Scale notes sit next to each query: what shuffles, what
broadcasts, what the plan must look like at 100 TB.

Float reductions use the decimal-cast convention (functions.dsum/davg ↔
dsum_expr/davg_expr) for bit-identical cross-engine values.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pypeln_spark import relational as R
from pypeln_spark.functions import davg, davg_expr, dsum, dsum_expr

from .base import register, tables


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_expr('l_quantity')} AS avg_qty,
           {davg_expr('l_extendedprice')} AS avg_price,
           {davg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape. Scale: single scan + partial/final hash aggregate;
    the shuffle carries ≤ (groups × partitions) rows — negligible at any SF.
    Filter pushes to the parquet scan."""
    (li,) = tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        R.agg(
            li.filter(F.col("l_shipdate") <= "1998-09-02"),
            by=["l_returnflag", "l_linestatus"],
            aggs={
                "sum_qty": dsum("l_quantity"),
                "sum_base_price": dsum("l_extendedprice"),
                "sum_disc_price": dsum(disc_price),
                "sum_charge": dsum(charge),
                "avg_qty": davg("l_quantity"),
                "avg_price": davg("l_extendedprice"),
                "avg_disc": davg("l_discount"),
                "count_order": F.count(F.lit(1)),
            },
        )
    ).df


@register(
    "q6_revenue_delta",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-reduce. At 100 TB this is IO-bound;
    every predicate must reach PushedFilters (verified in tests/plans)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "agg_nation_customer_stats",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           {dsum_expr('c.c_acctbal')} AS total_acctbal,
           {davg_expr('c.c_acctbal')} AS avg_acctbal,
           MIN(c.c_acctbal) AS min_acctbal,
           MAX(c.c_acctbal) AS max_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_nation_customer_stats(spark, sf_dir):
    """Broadcast join (25-row nation) + hash agg — zero fact-table shuffle
    for the join; only the tiny aggregate shuffles."""
    cust, nation = tables(spark, sf_dir, "customer", "nation")
    j = R.join(cust, nation, F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True)
    return R.agg(
        j,
        by=["n_name"],
        aggs={
            "n_customers": F.count(F.lit(1)),
            "total_acctbal": dsum("c_acctbal"),
            "avg_acctbal": davg("c_acctbal"),
            "min_acctbal": F.min("c_acctbal"),
            "max_acctbal": F.max("c_acctbal"),
        },
    ).df


@register(
    "groupby_having_hot_parts",
    oracle=f"""
    SELECT l_partkey, COUNT(*) AS n_items, {dsum_expr('l_quantity')} AS total_qty
    FROM lineitem GROUP BY l_partkey
    HAVING COUNT(*) >= 40
    """,
)
def groupby_having_hot_parts(spark, sf_dir):
    """GROUP BY + HAVING — Catalyst plans the having as a post-agg filter."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        R.agg(
            li,
            by=["l_partkey"],
            aggs={"n_items": F.count(F.lit(1)), "total_qty": dsum("l_quantity")},
        )
        .filter(F.col("n_items") >= 40)
        .df
    )


@register(
    "count_distinct_parts_by_brand",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
           COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
)
def count_distinct_parts_by_brand(spark, sf_dir):
    """Multi count-distinct — Catalyst expands to a single-pass partial
    aggregate (OptimizeDistinctAggregates), no extra scan per distinct."""
    (part,) = tables(spark, sf_dir, "part")
    return R.agg(
        part,
        by=["p_brand"],
        aggs={
            "n_types": F.countDistinct("p_type"),
            "n_sizes": F.countDistinct("p_size"),
            "n_parts": F.count(F.lit(1)),
        },
    ).df


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. Scale: customer filter first (selectivity ~1/5), then
    orders⋈customer (broadcast at small SF, AQE decides at large), then the
    fact join on orderkey; top-10 lowers to TakeOrderedAndProject — no global
    sort. Tie-broken by orderkey so LIMIT is deterministic."""
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    j = R.join(
        R.join(
            orders.filter(F.col("o_orderdate") < "1998-03-15"),
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        ),
        li.filter(F.col("l_shipdate") > "1998-03-15"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    aggd = R.agg(
        j,
        by=["l_orderkey", "o_orderdate", "o_orderpriority"],
        aggs={"revenue": dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))},
    )
    top = R.top_k(
        aggd, 10, [F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()]
    )
    return top.df.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape, 6-way join. Scale: region/nation/supplier broadcast
    (≤ thousands of rows even at SF-100k); the only real shuffles are
    orders⋈customer and lineitem⋈orders on their keys."""
    cust, orders, li, supp, nation, region = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    j = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return R.agg(
        j,
        by=["n_name"],
        aggs={"revenue": dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))},
    ).df


@register(
    "semi_join_auto_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE')
    """,
)
def semi_join_auto_orders(spark, sf_dir):
    """EXISTS → left-semi join; the probe side streams, no row duplication."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    s = R.semi_join(
        orders,
        cust.filter(F.col("c_mktsegment") == "AUTOMOBILE"),
        F.col("o_custkey") == F.col("c_custkey"),
        broadcast=True,
    )
    return s.df.select("o_orderkey", "o_totalprice")


@register(
    "anti_join_idle_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_idle_customers(spark, sf_dir):
    """NOT EXISTS → left-anti join."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    s = R.anti_join(cust, orders, F.col("c_custkey") == F.col("o_custkey"))
    return s.df.select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------

@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark, sf_dir):
    """Top-k per group: one shuffle on the partition key, per-partition sort.
    Deterministic via the orderkey tiebreak."""
    (orders,) = tables(spark, sf_dir, "orders")
    s = R.window_rank(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return s.df.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark, sf_dir):
    """Running total per customer. The windowed SUM goes through the decimal
    cast so the cumulative value is exact — engines disagree on double
    accumulation order inside window frames (segment-tree vs sequential)."""
    (orders,) = tables(spark, sf_dir, "orders")
    s = R.running(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        aggs={
            "running_spend": lambda w: F.sum(
                F.col("o_totalprice").cast("decimal(38,4)")
            ).over(w).cast("double")
        },
    )
    return s.df.select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")


@register(
    "window_lag_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_lag_order_gap_days(spark, sf_dir):
    """LAG + date arithmetic: days between consecutive orders per customer."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    df = (orders
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).cast("long").alias("days_since_prev"),
        ))
    return df


# --------------------------------------------------------------------------
# Sorts / limits / set ops / distinct
# --------------------------------------------------------------------------

@register(
    "top_k_expensive_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 25
    """,
)
def top_k_expensive_parts(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition heaps, driver
    merge) — the only sane top-k at 100 TB."""
    (part,) = tables(spark, sf_dir, "part")
    s = R.top_k(part, 25, [F.col("p_retailprice").desc(), F.col("p_partkey").asc()])
    return s.df.select("p_partkey", "p_name", "p_retailprice")


@register(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark, sf_dir):
    """INTERSECT (set semantics) — nations with both customers and suppliers."""
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    s = R.intersect(
        cust.select(F.col("c_nationkey").alias("nationkey")),
        supp.select(F.col("s_nationkey").alias("nationkey")),
    )
    return s.df


@register(
    "set_except_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier
    """,
)
def set_except_nations(spark, sf_dir):
    """EXCEPT — customer nations with no suppliers."""
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    s = R.except_(
        cust.select(F.col("c_nationkey").alias("nationkey")).distinct(),
        supp.select(F.col("s_nationkey").alias("nationkey")).distinct(),
    )
    return s.df


@register(
    "distinct_order_months",
    oracle="SELECT DISTINCT date_trunc('month', o_orderdate) AS order_month FROM orders",
)
def distinct_order_months(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return R.distinct(
        orders.select(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
    ).df


# --------------------------------------------------------------------------
# Rollup / cube / pivot
# --------------------------------------------------------------------------

@register(
    "rollup_order_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {dsum_expr('o_totalprice')} AS total_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status_priority(spark, sf_dir):
    """ROLLUP — hierarchical subtotals in one pass (Catalyst Expand node)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return R.agg(
        orders,
        by=["o_orderstatus", "o_orderpriority"],
        aggs={"n_orders": F.count(F.lit(1)), "total_price": dsum("o_totalprice")},
        kind="rollup",
    ).df


@register(
    "cube_lineitem_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items, {dsum_expr('l_quantity')} AS total_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark, sf_dir):
    """CUBE — all grouping-set combinations in one Expand pass."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return R.agg(
        li,
        by=["l_returnflag", "l_linestatus"],
        aggs={"n_items": F.count(F.lit(1)), "total_qty": dsum("l_quantity")},
        kind="cube",
    ).df


@register(
    "pivot_priority_by_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_priority_by_status(spark, sf_dir):
    """PIVOT with explicit values (never scan-for-distinct at scale).
    Missing combinations surface as count 0 (matching SQL FILTER semantics),
    not null."""
    (orders,) = tables(spark, sf_dir, "orders")
    p = R.pivot(
        orders, by=["o_orderpriority"], pivot_col="o_orderstatus",
        values=["O", "F", "P"], agg_col=F.count(F.lit(1)),
    ).df
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )


# --------------------------------------------------------------------------
# Scalar functions / CASE / JSON
# --------------------------------------------------------------------------

@register(
    "scalar_function_gauntlet",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_type, 1, 6) AS type_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           abs(p_size - 25) AS size_dist,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_bucket,
           coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other,
           replace(lower(p_name), ' ', '_') AS slug
    FROM part
    """,
)
def scalar_function_gauntlet(spark, sf_dir):
    """String/math/conditional scalar passthrough — all JVM-side codegen,
    zero Python in the plan."""
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_bucket"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#11")), F.lit("OTHER")).alias("brand_or_other"),
        F.replace(F.lower("p_name"), F.lit(" "), F.lit("_")).alias("slug"),
    )


@register(
    "date_function_gauntlet",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           date_trunc('week', o_orderdate) AS order_week,
           o_orderdate + INTERVAL 90 DAY AS due_date
    FROM orders
    """,
)
def date_function_gauntlet(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("week", F.col("o_orderdate")).alias("order_week"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


@register(
    "case_when_price_tiers",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS tier,
           COUNT(*) AS n_orders,
           {dsum_expr('o_totalprice')} AS total
    FROM orders GROUP BY 1
    """,
)
def case_when_price_tiers(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return R.agg(
        orders.withColumn("tier", tier),
        by=["tier"],
        aggs={"n_orders": F.count(F.lit(1)), "total": dsum("o_totalprice")},
    ).df


@register(
    "json_extract_event_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE event_type = 'purchase'
    """,
)
def json_extract_event_props(spark, sf_dir):
    """JSON scalar extraction — get_json_object is JVM-side (Jackson), no UDF."""
    (events,) = tables(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# Event analytics (batch forms; streaming variants live in streaming.py)
# --------------------------------------------------------------------------

@register(
    "events_hourly_by_type",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events, {dsum_expr('value', 6)} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_by_type(spark, sf_dir):
    """Tumbling-window aggregate, batch form."""
    (events,) = tables(spark, sf_dir, "events")
    return R.agg(
        events.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
        by=["hour", "event_type"],
        aggs={"n_events": F.count(F.lit(1)), "total_value": dsum("value", 6)},
    ).df


@register(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def events_sessionization(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via lag + cumulative flag —
    the classic batch formulation; one shuffle on user_id covers both
    windows and the final group-by."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return R.agg(
        sessions,
        by=["user_id", "session_seq"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "session_start": F.min("ts"),
            "session_end": F.max("ts"),
        },
    ).df.select("user_id", F.col("session_seq").cast("long").alias("session_seq"),
                "n_events", "session_start", "session_end")
