"""TPC-H completion pack — the 10 analytical shapes the earlier packs left
out (Q2, Q7, Q8, Q9, Q11, Q12, Q15, Q16, Q20, Q21), adapted to the testdata
schema: there is no partsupp table, so the supply relation is derived as the
distinct (l_partkey, l_suppkey) pairs actually observed in lineitem, with
unit cost = min(l_extendedprice / l_quantity). No commit/receipt dates
either, so Q12/Q21's lateness predicate becomes ship-vs-order-date gap.

Together with relational.py (Q1/3/5/6) and relational3.py
(Q4/10/13/14/17/18/19/22) this covers all 22 TPC-H query shapes —
correlated subqueries (Q2, Q15, Q17), scalar-aggregate thresholds (Q11),
multi-way nation joins (Q7/8/9), EXISTS/NOT-EXISTS pairs (Q21), and NOT IN
(Q16) — each with a DuckDB oracle and a 100 TB-shaped Spark plan
(lineitem never broadcast, dims always broadcast, TakeOrderedAndProject
for every bounded output).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pypeln_spark import relational as R
from pypeln_spark.functions import dsum, dsum_expr

from .base import register, tables


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name, sp.unit_cost,
             MIN(sp.unit_cost) OVER (PARTITION BY p.p_partkey) AS best_cost
      FROM part p
      JOIN supply sp ON sp.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM eligible WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the REGION-minimum unit cost — the classic correlated-min subquery,
    lowered to ONE window min over the eligible join (no second scan of the
    supply relation, no self-join: the correlated subquery and the outer
    query read the same rows, so a partition-min window is the plan a 100 TB
    run wants). Dims (part-filtered, supplier, nation, region) broadcast;
    the derived supply agg shuffles lineitem once on (partkey, suppkey)."""
    part, sup, nation, region, li = tables(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    p = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    eligible = (
        supply.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    best = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    out = (
        eligible.withColumn("best_cost", best)
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
    )
    return R.top_k(
        out,
        100,
        by=[
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. Both nation dims broadcast (aliased independently — Spark
    disambiguates via distinct join keys); lineitem shuffles once on
    orderkey, supplier broadcasts. The symmetric nation-pair disjunction
    stays a residual filter after the joins, exactly where Catalyst can
    evaluate it cheapest."""
    li, orders, cust, sup, nation = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {dsum_expr("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {dsum_expr('volume')} AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by year — the deepest join tree in the pack (7 relations, nation
    joined twice). Every dim broadcasts; the only shuffles are lineitem⋈
    orders⋈customer on their keys and the final tiny group-by-year. The
    share is a conditional-sum / sum on the SAME aggregated pass — one
    scan, not two."""
    li, orders, cust, nation, region, part, sup = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region",
        "part", "supplier",
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("cn_region"),
        )
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return vol.groupBy("o_year").agg(
        (dsum(nation_vol) / dsum(F.col("volume"))).alias("mkt_share")
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           {dsum_expr('l_extendedprice * (1 - l_discount) - 0.05 * p_retailprice * l_quantity')} AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern. No partsupp here, so supply cost is modeled as
    5% of p_retailprice per unit — the join/agg shape (lineitem ⋈ filtered
    part ⋈ supplier ⋈ nation ⋈ orders, then a 25×years group) is what Q9
    exercises. part is filtered BEFORE its broadcast, so the pattern prunes
    the build side, not the probe."""
    li, part, sup, nation, orders = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.05) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    joined = (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum(profit).alias("profit"))


@register(
    "q11_important_part_values",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {dsum_expr('l_extendedprice')} AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, value
    FROM pv
    WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
    ORDER BY value DESC, p_partkey
    LIMIT 100
    """,
)
def q11_important_part_values(spark, sf_dir):
    """TPC-H Q11 shape: parts whose inventory value (here: shipped value
    through suppliers of a nation group) exceeds a FRACTION OF THE GLOBAL
    TOTAL — the scalar-aggregate-subquery threshold. The per-part aggregate
    computes once and self-serves both the rows and the threshold via a
    cross-joined scalar (broadcast of one row); no second lineitem scan.
    The threshold comparison is double-vs-double on identically-derived
    dsum values, so the row set is engine-stable."""
    li, sup = tables(spark, sf_dir, "lineitem", "supplier")
    pv = (
        li.join(
            F.broadcast(sup.filter(F.col("s_nationkey") < 5)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("value"))
    )
    # scalar threshold: decimal-exact sum of the already-rounded doubles
    thr = pv.agg((dsum("value", scale=6) * F.lit(0.001)).alias("_thr"))
    out = (
        pv.join(F.broadcast(thr))
        .filter(F.col("value") > F.col("_thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )
    return R.top_k(out, 100, by=[F.col("value").desc(), F.col("p_partkey").asc()])


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape: order-priority mix per shipment class. No ship mode
    or receipt date in this schema, so the class is the ship-vs-order-date
    gap (late = shipped >60 days after ordering) — same conditional-count
    aggregation pattern. One orderkey shuffle; the date filter prunes the
    lineitem scan."""
    li, orders = tables(spark, sf_dir, "lineitem", "orders")
    joined = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    return joined.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the view + scalar-max correlated pattern. The revenue aggregate
    computes once; the max arrives as a broadcast one-row scalar; ties
    (all) are kept, exactly like the spec's equality predicate. dsum makes
    revenue bit-identical across engines, so the argmax row set is too."""
    li, sup = tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%77')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    with a NOT IN exclusion subquery. The NOT IN lowers to a broadcast
    left-anti join (safe: s_suppkey is non-null by construction — the
    null-poisoning NOT IN edge case is covered by
    not_in_parts_never_shipped); supply derives as a distinct over
    lineitem's (part, supp) pairs, shuffling skinny 16-byte rows once."""
    li, part, sup = tables(spark, sf_dir, "lineitem", "part", "supplier")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    p = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    excluded = sup.filter(F.col("s_name").like("%77")).select("s_suppkey")
    counts = (
        supply.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
    return R.top_k(
        counts,
        100,
        by=[
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        ],
    )


@register(
    "q20_excess_volume_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sp GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT sp.l_suppkey
      FROM sp
      JOIN tot ON tot.l_partkey = sp.l_partkey
      JOIN part ON p_partkey = sp.l_partkey
      WHERE p_name LIKE 'red%' AND sp.supp_qty > 0.3 * tot.part_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN dominant ON l_suppkey = s_suppkey
    WHERE s_nationkey < 13
    ORDER BY s_suppkey
    """,
)
def q20_excess_volume_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who dominate the supply of some
    qualifying part (here: shipped >30% of a 'red%' part's 1996 volume;
    the original's availqty-vs-half-of-demand needs partsupp). Nested
    semi-join chain: per-(part,supp) quantities roll up once, the per-part
    total reuses that aggregate (no second lineitem scan), the dominance
    filter semi-joins back to supplier. l_quantity sums are small-int
    doubles — exact in IEEE, so the 0.3 threshold is engine-stable."""
    li, part, sup = tables(spark, sf_dir, "lineitem", "part", "supplier")
    sp = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = sp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        sp.join(tot, F.col("t_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.filter(F.col("s_nationkey") < 13)
        .join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finalized orders — the EXISTS + NOT EXISTS pair, lowered
    to a left-semi (another supplier shipped in the order) and a left-anti
    (no OTHER supplier was late) on the same orderkey. Lateness = shipped
    >60 days after ordering (no receipt/commit dates in this schema). The
    late set computes once and feeds both its own rows and the NOT EXISTS
    probe; all joins shuffle on orderkey only."""
    li, orders, sup = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    l1 = (
        late.join(
            others,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    counts = (
        l1.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return R.top_k(counts, 100, by=[F.col("numwait").desc(), F.col("s_name").asc()])


@register(
    "merge_upsert_orders",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
      FROM orders b LEFT JOIN upd ON b.o_orderkey = upd.o_orderkey
      WHERE upd.o_orderkey IS NULL
      UNION ALL
      SELECT * FROM upd
    )
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE/upsert (relational.merge_upsert): a deterministic update set —
    every 97th order repriced +10% with status 'U', every 101st order
    re-inserted under a shifted key as a new 'N' row — merged into orders.
    Updates win on key match, unmatched base rows survive, new keys insert.
    The anti-join side broadcasts (updates ≪ base), so the base scan never
    shuffles — the MERGE shape that stays cheap when 0.1% of a 100 TB
    table changes. Oracle spells the identical anti-join + union."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = (
        base.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + F.lit(100000000)).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("o_totalprice"),
            )
        )
    )
    return R.merge_upsert(base, upd, on="o_orderkey").df


def _ancestry_sql(idiv: str) -> str:
    """The recursion, parameterized only by integer-division spelling
    (Spark: `x DIV 3`, DuckDB: `x // 3`) — otherwise char-identical."""
    return f"""
    WITH RECURSIVE anc(node, ancestor, depth) AS (
      SELECT n_nationkey, {idiv.format(x='n_nationkey')}, 1
      FROM nation WHERE n_nationkey > 0
      UNION ALL
      SELECT a.node, {idiv.format(x='a.ancestor')}, a.depth + 1
      FROM anc a WHERE a.ancestor > 0
    )
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS n_ancestors,
           CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           CAST(SUM(ancestor) AS BIGINT) AS ancestor_sum
    FROM anc GROUP BY node
"""


@register("recursive_cte_ancestry", oracle=_ancestry_sql("({x} // 3)"))
def recursive_cte_ancestry(spark, sf_dir):
    """WITH RECURSIVE executed BY SPARK (new in Spark 4): ancestor-chain
    walk over the implicit tree parent(n) = n div 3 rooted at nation key 0
    — the org-chart/BOM-explosion shape recursive SQL exists for. Spark's
    recursion accepts UNION ALL only (no fixpoint dedup yet), so the
    recursion must be structurally terminating — a tree walk is; general
    cyclic closure stays with the DataFrame label-propagation loop
    (ext/dedup.connected_components), which also owns the 100 TB case.
    Oracle is the same statement modulo integer-division spelling."""
    (nation,) = tables(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation")
    return spark.sql(_ancestry_sql("({x} DIV 3)"))
