"""TPC-H-shaped analytical pack, adapted to the testdata star schema.

Eight classic decision-support shapes (Q4/Q10/Q13/Q14/Q17/Q18/Q19/Q22
analogues — the schema has no partsupp/comment/phone columns, so predicates
are re-targeted to the columns that exist; the JOIN/AGG/subquery structure
each query exists to exercise is preserved). Every float reduction uses the
decimal-cast convention (functions.dsum/davg) so the DuckDB hash-compare is
bit-exact; every top-k orders by a unique tiebreak so rank boundaries agree.

Scale notes ride each query: what broadcasts, what shuffles, what the plan
must look like when lineitem is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pypeln_spark import relational as R
from pypeln_spark.ext.hashing import sql_h31
from pypeln_spark.functions import dsum, dsum_expr

from .base import register, tables


@register(
    "q4_order_priority_checking",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_checking(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    (shipped >30 days after ordering), then a tiny group count. Scale: the
    semi join shuffles both sides on l_orderkey ONCE and emits at most one
    row per order; the date filter prunes the orders scan first."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_item_ranking",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: which customers returned the most revenue last
    quarter. Scale: lineitem (the 100 TB side) is filtered to 'R' rows at
    the scan, joins shuffle on orderkey once, nation broadcasts, and the
    final TakeOrderedAndProject(20) never materializes a global sort."""
    cust, orders, li, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    aggd = joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        dsum(revenue).alias("revenue")
    )
    return R.top_k(aggd, 20, by=[F.col("revenue").desc(), F.col("c_custkey").asc()])


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: order-count histogram over a LEFT join (customers
    with zero orders must survive into the c_count=0 bucket). Scale: one
    shuffle on custkey for the outer join + first count; the second
    aggregation's key space is tiny (distinct counts)."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT 100.0 * {dsum_expr(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    )} / {dsum_expr('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join — the
    promo share of one month's revenue. Scale: the month filter prunes the
    lineitem scan, part broadcasts (or shuffles on partkey at extreme part
    counts), and both sums collapse map-side to one row."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    month = li.filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        month.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo_rev) / dsum(rev)).alias("promo_revenue_pct"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH branded AS (
      SELECT l_extendedprice, l_quantity,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (PARTITION BY l_partkey)
                  AS DOUBLE)
               / CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS DOUBLE) AS avg_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#23'
    )
    SELECT {dsum_expr('l_extendedprice')} / 7.0 AS avg_yearly
    FROM branded WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand —
    the classic correlated-AVG subquery, expressed as a window mean (the
    one-shuffle formulation; the correlated form would scan lineitem twice).
    The per-part mean goes through the decimal-sum/count spelling on both
    engines so the 0.5×avg comparison boundary is bit-identical. Scale:
    brand filter → broadcast part join → one shuffle on l_partkey."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    branded = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#23")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        branded.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum_expr('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {dsum_expr('l_quantity')} > 180.0
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    joined back to customer — the GROUP-BY-then-join-back pattern. Scale:
    the quantity rollup is the only lineitem-sized shuffle; its survivors
    (a tiny fraction) drive the remaining joins, and the top-100 runs as
    TakeOrderedAndProject."""
    li, orders, cust = tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180.0)
    )
    joined = big.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).join(
        cust, F.col("c_custkey") == F.col("o_custkey")
    )
    return R.top_k(
        joined.select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        ),
        100,
        by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: an OR-of-ANDs mixing both join sides — the
    predicate-pushdown stress test. Catalyst splits the disjunction into
    per-side implied filters (l_quantity ∈ [1,30], p_size ∈ [1,15],
    brand ∈ {{...}}) that DO push to both scans; the residual OR evaluates
    after the broadcast join."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(dsum(rev).alias("revenue"))


@register(
    "q22_dormant_customers",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS numcust, {dsum_expr('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {dsum_expr('c_acctbal')} / CAST(COUNT(*) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: positive-balance-above-average customers with no
    recent orders — scalar subquery + NOT EXISTS anti-join + group. Scale:
    the average is one scalar broadcast; the anti join shuffles on custkey
    against the date-pruned orders slice only."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    # scalar subquery as a broadcast single-row join (no driver-side
    # collect — the plan stays one lazy DAG end to end)
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1)).cast("double")).alias("_avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        cust.join(F.broadcast(avg_bal), F.lit(True))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH tv AS (
      SELECT user_id, MIN(ts) AS t_v FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ),
    tc AS (
      SELECT e.user_id, MIN(e.ts) AS t_c
      FROM events e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'click' AND e.ts > tv.t_v
      GROUP BY e.user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(e.ts) AS t_p
      FROM events e JOIN tc ON e.user_id = tc.user_id
      WHERE e.event_type = 'purchase' AND e.ts > tc.t_c
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM tv) AS n_viewed,
           (SELECT COUNT(*) FROM tc) AS n_clicked_after,
           (SELECT COUNT(*) FROM tp) AS n_purchased_after,
           CAST((SELECT COUNT(*) FROM tc) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM tv) AS DOUBLE) AS click_rate,
           CAST((SELECT COUNT(*) FROM tp) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM tc) AS DOUBLE) AS purchase_rate
    """,
)
def events_funnel_conversion(spark, sf_dir):
    """Ordered funnel: users whose first view precedes a click precedes a
    purchase (strict event-time order, not mere co-occurrence). Each stage
    is one filtered aggregate joined to the previous stage's first-passage
    time — all three shuffles key on user_id, so at scale they land in the
    same hash partitioning and AQE elides the re-exchange. Counts are
    exact integers; rates one IEEE division each."""
    (events,) = tables(spark, sf_dir, "events")
    tv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    tc = (
        events.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    tp = (
        events.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    nv = tv.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = tc.agg(F.count(F.lit(1)).alias("n_clicked_after"))
    np_ = tp.agg(F.count(F.lit(1)).alias("n_purchased_after"))
    return (
        nv.join(F.broadcast(nc))
        .join(F.broadcast(np_))
        .select(
            "n_viewed",
            "n_clicked_after",
            "n_purchased_after",
            (
                F.col("n_clicked_after").cast("double")
                / F.col("n_viewed").cast("double")
            ).alias("click_rate"),
            (
                F.col("n_purchased_after").cast("double")
                / F.col("n_clicked_after").cast("double")
            ).alias("purchase_rate"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
    )
    SELECT CAST(f.cohort_date AS VARCHAR) AS cohort_date,
           CAST(date_diff('day', f.cohort_date, a.active_date) AS BIGINT)
             AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort_date, day_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Retention triangle: users grouped by first-seen date, activity
    counted per (cohort, day-offset) cell — the table every DAU/retention
    curve reads from. Scale: first-seen and distinct-activity are both
    user-keyed partial aggregates; the cohort join shuffles on user_id
    once; the final cell grid is tiny (days × days)."""
    (events,) = tables(spark, sf_dir, "events")
    day = F.to_date("ts")
    first_seen = events.groupBy("user_id").agg(F.min(day).alias("cohort_date"))
    activity = events.select("user_id", day.alias("active_date")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            # DATE stringifies differently per engine in the hash compare
            # (pandas normalizes DuckDB dates to midnight timestamps) —
            # emit ISO strings, the canonicalizer-stable spelling
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("active_date", "cohort_date").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "full_outer_month_spenders",
    oracle=f"""
    WITH jan AS (
      SELECT o_custkey, {dsum_expr('o_totalprice')} AS jan_spend
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-02-01'
      GROUP BY o_custkey
    ),
    feb AS (
      SELECT o_custkey, {dsum_expr('o_totalprice')} AS feb_spend
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-02-01'
        AND o_orderdate < TIMESTAMP '1996-03-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(jan.o_custkey, feb.o_custkey) AS custkey,
           COALESCE(jan_spend, 0.0) AS jan_spend,
           COALESCE(feb_spend, 0.0) AS feb_spend,
           CASE WHEN jan.o_custkey IS NULL THEN 'feb_only'
                WHEN feb.o_custkey IS NULL THEN 'jan_only'
                ELSE 'both' END AS presence
    FROM jan FULL OUTER JOIN feb ON jan.o_custkey = feb.o_custkey
    """,
)
def full_outer_month_spenders(spark, sf_dir):
    """FULL OUTER join (the one join type the rest of the registry doesn't
    exercise): per-customer spend in two adjacent months, customers absent
    from either side surviving with a zero. Scale: both aggregates and the
    join share the custkey hash partitioning — one logical shuffle."""
    (orders,) = tables(spark, sf_dir, "orders")

    def month_spend(lo, hi, alias):
        return (
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .groupBy(F.col("o_custkey").alias(f"_{alias}_key"))
            .agg(dsum("o_totalprice").alias(f"{alias}_spend"))
        )

    jan = month_spend("1996-01-01", "1996-02-01", "jan")
    feb = month_spend("1996-02-01", "1996-03-01", "feb")
    joined = jan.join(feb, jan["_jan_key"] == feb["_feb_key"], "full_outer")
    return joined.select(
        F.coalesce("_jan_key", "_feb_key").alias("custkey"),
        F.coalesce("jan_spend", F.lit(0.0)).alias("jan_spend"),
        F.coalesce("feb_spend", F.lit(0.0)).alias("feb_spend"),
        F.when(F.col("_jan_key").isNull(), "feb_only")
        .when(F.col("_feb_key").isNull(), "jan_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "group_map_median_chars",
    oracle="""
    SELECT lang, CAST(median(n_chars) AS DOUBLE) AS median_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def group_map_median_chars(spark, sf_dir):
    """Grouped-map (applyInPandas) surface: per-language median document
    length computed by an arbitrary pandas function over each whole group
    (relational.group_map). Median of integers is sort + middle(-pair
    mean) — exact halves, bit-identical to DuckDB's median. Scale: one
    shuffle on lang; each group materializes as a pandas frame, so the
    operator's bound is group size, not corpus size (documented
    constraint)."""
    import pandas as pd

    (docs,) = tables(spark, sf_dir, "documents")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "median_chars": [float(pdf["n_chars"].median())],
                "n_docs": [len(pdf)],
            }
        )

    return R.group_map(
        docs.select("lang", "n_chars"),
        "lang",
        stats,
        "lang string, median_chars double, n_docs long",
    ).df


@register(
    "group_agg_udaf_midrange",
    oracle="""
    SELECT p_brand,
           (MIN(p_retailprice) + MAX(p_retailprice)) / 2.0 AS midrange_price,
           COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
)
def group_agg_udaf_midrange(spark, sf_dir):
    """Pandas UDAF surface (GROUPED_AGG): per-brand midrange price from a
    custom Python reduction (relational.group_agg) next to a built-in
    count in the SAME agg — the composability group_map lacks. min/max
    then one IEEE add/divide → bit-identical cross-engine. The reference
    has no UDAF at all (SURVEY §2.2)."""
    (part,) = tables(spark, sf_dir, "part")
    out = R.group_agg(
        part,
        "p_brand",
        {
            "midrange_price": (
                lambda s: (s.min() + s.max()) / 2.0,
                "p_retailprice",
                "double",
            )
        },
    )
    return out.df.join(
        part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts")), "p_brand"
    )


@register(
    "fuzzy_join_supplier_names",
    oracle="""
    WITH k AS (
      SELECT s_suppkey, s_name,
             unnest(list_distinct(list_transform(range(0, len(s_name) + 1),
               i -> CASE WHEN i = 0 THEN s_name
                    ELSE substr(s_name, 1, CAST(i AS INT) - 1)
                         || substr(s_name, CAST(i AS INT) + 1) END))) AS _k
      FROM supplier
    )
    SELECT DISTINCT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           a.s_name AS name_a, b.s_name AS name_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS distance
    FROM k a JOIN k b ON a._k = b._k AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def fuzzy_join_supplier_names(spark, sf_dir):
    """Entity-resolution fuzzy join (ext/text.fuzzy_join_lev1): supplier
    names within Levenshtein distance 1, via deletion-neighborhood
    blocking — recall-LOSSLESS for distance ≤ 1 (unlike LSH blocking),
    candidates ∝ key collisions, verify is an integer edit distance both
    engines compute identically. The same candidates-then-verify
    architecture as MinHash-LSH with a provably exact blocking scheme."""
    from pypeln_spark.ext import text as X

    (supp,) = tables(spark, sf_dir, "supplier")
    return X.fuzzy_join_lev1(supp, "s_name", "s_suppkey")


@register(
    "events_gapfill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)
    ),
    span AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM span
    )
    SELECT g.user_id, g.hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.hour = g.hour
    """,
)
def events_gapfill_hourly(spark, sf_dir):
    """Time-series gap filling: a dense hourly grid per user (first to last
    active hour, zero-filled) — what resampling/rate queries and feature
    windows need before they can assume regular spacing. Scale: the grid
    generates from a 2-row-per-user span aggregate (sequence + explode, no
    cross join against a calendar table); both the counts and the grid
    shuffle on user_id, so the left join shares one partitioning."""
    (events,) = tables(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("user_id") < 20)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n_events")
    )


@register(
    "events_scd2_status_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN event_type = LAG(event_type) OVER w THEN 0 ELSE 1 END
               AS chg
      FROM events WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grp AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM seq
    ),
    island_rows AS (
      SELECT user_id, event_type AS status, CAST(island AS BIGINT) AS island,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM grp GROUP BY user_id, event_type, island
    )
    SELECT user_id, status, island, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           n_events
    FROM island_rows
    """,
)
def events_scd2_status_intervals(spark, sf_dir):
    """SCD2 / gaps-and-islands: collapse each user's consecutive
    same-status events into validity intervals (valid_from, valid_to =
    next island's start, NULL while current) — the change-data-capture
    shape dimension tables are versioned with. Three windows + one
    aggregate, all partitioned on user_id: a single shuffle keying
    everything, with (ts, event_id) as the total order so ties can't make
    the islands engine-dependent."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.filter(F.col("user_id") < 30).withColumn(
        "chg",
        F.when(F.col("event_type") == F.lag("event_type").over(w), 0).otherwise(1),
    )
    grp = seq.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    islands = grp.groupBy(
        "user_id", F.col("event_type").alias("status"), "island"
    ).agg(F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events"))
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    return islands.select(
        "user_id", "status", "island", "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"), "n_events",
    )


@register(
    "window_distribution_gauntlet",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
           percent_rank() OVER w AS price_percent_rank,
           cume_dist() OVER w AS price_cume_dist
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_gauntlet(spark, sf_dir):
    """Distribution window functions — dense_rank / percent_rank /
    cume_dist — the three the navigation gauntlet doesn't cover.
    percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are single IEEE
    divisions of exact integers, so both engines agree bitwise; the
    (price, orderkey) order is total, so rank ties can't differ. One
    shuffle on the partition key."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.filter(F.col("o_custkey") < 100).select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_percent_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


@register(
    "events_time_to_convert_quantiles",
    oracle=f"""
    WITH tv AS (
      SELECT user_id, MIN(ts) AS t_v FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(e.ts) AS t_p
      FROM events e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'purchase' AND e.ts > tv.t_v
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT tp.user_id,
             CAST(epoch_us(tp.t_p) - epoch_us(tv.t_v) AS BIGINT) AS latency_us,
             {sql_h31('CAST(tp.user_id AS VARCHAR)')} AS h
      FROM tp JOIN tv ON tv.user_id = tp.user_id
    ),
    r AS (
      SELECT latency_us,
             ROW_NUMBER() OVER (ORDER BY h, latency_us) AS rn
      FROM lat
    ),
    sv AS (
      SELECT latency_us,
             ROW_NUMBER() OVER (ORDER BY latency_us) AS vr,
             COUNT(*) OVER () AS m
      FROM r WHERE rn <= 128
    ),
    q AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m_sample,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.5 * m) AS BIGINT))
                 THEN latency_us END) AS est_p50,
             MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.9 * m) AS BIGINT))
                 THEN latency_us END) AS est_p90
      FROM sv
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lat) AS n_converted,
           q.m_sample, q.est_p50, q.est_p90
    FROM q
    """,
)
def events_time_to_convert_quantiles(spark, sf_dir):
    """Funnel latency distribution: per converting user, the microsecond
    gap between first view and first subsequent purchase, summarized as
    p50/p90 via the bottom-k quantile sketch (k=128 — the partition-
    invariant, cross-engine-exact stand-in for approx_percentile over a
    latency column; groups under k would be exact). The product-analytics
    follow-up to events_funnel_conversion: not just HOW MANY convert but
    HOW FAST. Scale: two user_id-keyed first-passage aggregates (same
    partitioning, AQE elides the re-exchange) feeding the two-phase
    bottom-k sample; integer microseconds end to end."""
    from pypeln_spark.ext import sketch as K

    (events,) = tables(spark, sf_dir, "events")
    tv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    tp_ = (
        events.filter(F.col("event_type") == "purchase")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    lat = tp_.join(tv, "user_id").select(
        "user_id",
        (F.unix_micros("t_p") - F.unix_micros("t_v")).alias("latency_us"),
    )
    sk = K.bottomk_quantiles(
        lat, [], "user_id", "latency_us", k=128, probs=(0.5, 0.9)
    )
    n = lat.agg(F.count(F.lit(1)).alias("n_converted"))
    return n.join(F.broadcast(sk)).select(
        "n_converted", "m_sample", "est_p50", "est_p90"
    )
