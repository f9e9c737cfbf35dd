"""Scale-pattern evidence: skew salting and bucketed co-located joins —
the two manual levers SCALING.md promises beyond AQE."""

import pytest
from pyspark.sql import functions as F

from pypeln_spark import relational as R
from pypeln_spark.queries.base import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change results — only the key distribution."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = R.salted_join(li, orders, on="l_orderkey", salts=8).df.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert plain.n == salted.n
    assert plain.q == pytest.approx(salted.q)


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in `salts` distinct join partitions —
    verified by counting distinct salts actually assigned."""
    hot = spark.range(0, 10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(1, "x")], "k int, name string")
    j = R.salted_join(hot, dim, on="k", salts=8)
    assert j.df.count() == 10_000
    salt = F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(8))
    n_salts = hot.select(salt.alias("s")).distinct().count()
    assert n_salts == 8


def test_salted_join_rejects_right_preserving_how(spark):
    """ADVICE r1: the right side is replicated ×salts, so right/full joins
    would emit unmatched right rows `salts` times — refuse them."""
    left = spark.createDataFrame([(1, "a")], "k int, v string")
    right = spark.createDataFrame([(2, "b")], "k int, name string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            R.salted_join(left, right, on="k", how=how)


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key co-locate: the join plan must contain
    NO Exchange above either bucketed scan (shuffle-free join — the
    pre-partitioning story for repeatedly-joined 100 TB tables)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
