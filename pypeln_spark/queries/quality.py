"""Data-quality queries — expectations and profiling (ext/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pypeln_spark.ext import quality as Q
from pypeln_spark.functions import davg_expr

from .base import register, tables


@register(
    "quality_expectations_lineitem",
    oracle="""
    SELECT 'price_positive' AS metric,
           CAST(COUNT(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 END) AS BIGINT) AS value
    FROM lineitem
    UNION ALL
    SELECT 'qty_in_range',
           CAST(COUNT(CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'flag_valid',
           CAST(COUNT(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'rows_out',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE COALESCE(l_extendedprice > 0, FALSE)
    """,
)
def quality_expectations_lineitem(spark, sf_dir):
    """Row expectations (ext/quality.expect): three named rules — a
    drop-policy gate on positive prices plus two keep-and-count rules —
    whose violation tallies ride the SAME action as the surviving-row
    count via DataFrame.observe (zero extra scans; the drop rule pushes
    into the parquet scan like any filter). Output = the metric table a
    pipeline would ship to its monitoring sink; the oracle recomputes
    every tally relationally."""
    (li,) = tables(spark, sf_dir, "lineitem")
    rules = {
        "price_positive": (F.col("l_extendedprice") > 0, "drop"),
        "qty_in_range": (F.col("l_quantity").between(1, 50), "keep"),
        "flag_valid": (F.col("l_returnflag").isin("A", "N", "R"), "keep"),
    }
    out, obs = Q.expect(li, rules)
    rows_out = out.count()  # the action; violation metrics land with it
    got = Q.enforce(obs, rules)
    data = [(name, int(got[name])) for name in rules] + [("rows_out", int(rows_out))]
    return spark.createDataFrame(data, "metric string, value long")


@register(
    "quality_profile_orders",
    oracle=f"""
    SELECT 'o_orderkey' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value,
           {davg_expr('o_orderkey')} AS mean_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR),
           {davg_expr('o_custkey')}
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR),
           CAST(NULL AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR),
           CAST(NULL AS DOUBLE)
    FROM orders
    """,
)
def quality_profile_orders(spark, sf_dir):
    """Column profiling (ext/quality.profile): nulls, distincts, min/max
    and decimal-exact means for four orders columns — the ANALYZE TABLE
    shape, one final row unpivoted driver-free via a literal stack. Since
    r14 the stats compute in TWO aggregates (hash-able stats incl. the
    expanded multi-distinct, plus a keyless pass for string min/max) so
    the distinct dedup phase stays a HashAggregate instead of sort-based
    (see ext/quality.profile). The oracle spells the same statistics per
    column; means follow the dsum convention so values hash-match."""
    (orders,) = tables(spark, sf_dir, "orders")
    return Q.profile(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@register(
    "ivm_orders_priority_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def ivm_orders_priority_merge(spark, sf_dir):
    """Incremental aggregate maintenance (ext/incremental.merge_aggregates):
    history is split at 1996-01-01 into a 'materialized' aggregate and a
    'new data' delta aggregate, then MERGED — count/decimal-sum/min/max
    partials combine associatively, so the merge equals the full recompute
    (the oracle) bit for bit. The merge touches |keys| rows, not history:
    the nightly-ETL shape where absorbing a day costs O(delta + aggregate),
    never O(all data). Decimal partials stay decimal until the final cast —
    merging double-cast sums would reorder float addition across the merge
    boundary."""
    from pypeln_spark.ext import incremental as I

    (orders,) = tables(spark, sf_dir, "orders")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < "1996-01-01"))
    delta = partial(orders.filter(F.col("o_orderdate") >= "1996-01-01"))
    merged = I.merge_aggregates(
        base, delta, keys="o_orderpriority",
        merges={"n_orders": "count", "total_price": "sum",
                "min_price": "min", "max_price": "max"},
    )
    return merged.select(
        "o_orderpriority", "n_orders",
        F.col("total_price").cast("double").alias("total_price"),
        "min_price", "max_price",
    )


@register(
    "quality_table_diff_orders",
    oracle="""
    WITH l AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
               WHERE o_orderkey % 7 <> 0),
    r AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
                 o_totalprice
          FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
           CASE WHEN l.o_orderkey IS NULL THEN 'added'
                WHEN r.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
    WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL
       OR l.o_orderstatus <> r.o_orderstatus
       OR l.o_totalprice <> r.o_totalprice
    """,
)
def quality_table_diff_orders(spark, sf_dir):
    """Snapshot reconciliation (ext/quality.table_diff): two deterministic
    views of orders — the 'before' drops every 7th key, the 'after' drops
    every 5th and flips every 11th status — diffed into one row per
    differing key with added/removed/changed status. One full-outer key
    join comparing the payload as a single null-safe struct; the
    migration-acceptance shape. Oracle spells the same diff relationally."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    left = base.filter(F.col("o_orderkey") % 7 != 0)
    right = base.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return Q.table_diff(left, right, keys="o_orderkey")


@register(
    "events_value_anomalies",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mu,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS m2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu)) > 3.0
    """,
)
def events_value_anomalies(spark, sf_dir):
    """Statistical anomaly flagging: events whose value sits more than 3
    standard deviations from their event-type mean. Moments are
    DECIMAL-EXACT sums (E[x], E[x²] — the one-pass variance identity), so
    mean/std/z-scores are bit-identical cross-engine despite being float
    statistics; the per-group stats broadcast back over the scan (tiny
    frame — one row per type), so flagging 100 TB of events is one
    aggregate plus one broadcast-join pass. Quadratic terms quantize at
    1e-6 BEFORE squaring on both engines identically (value*value in the
    decimal cast)."""
    (events,) = tables(spark, sf_dir, "events")
    dt = "decimal(38,6)"
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast(dt)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mu"),
        (
            F.sum((F.col("value") * F.col("value")).cast(dt)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m2"),
    )
    z = (F.col("value") - F.col("mu")) / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu"))
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", "zscore")
    )


@register(
    "events_rolling_24h_stats",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS total_24h,
           MAX(value) OVER w AS max_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_24h_stats(spark, sf_dir):
    """TIME-RANGE window frame (the one frame kind rowsBetween can't
    express): per user, every event carries the count/decimal-exact
    sum/max of that user's events in the trailing 24 HOURS — peers enter
    the frame by VALUE distance on the ordering key, not row position, so
    bursts widen the frame and quiet periods shrink it. Ordering key is
    integer epoch-microseconds on BOTH engines (a timestamp cast to
    seconds would truncate on one engine and round on the other); the
    frame is one shuffle on user_id, state ∝ events within 24h per user.
    The decimal rolling sum keeps every frame's float reduction
    order-insensitive, so all 20k window values hash-match."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("total_24h"),
        F.max("value").over(w).alias("max_24h"),
    )


@register(
    "histogram_equi_depth_by_type",
    oracle="""
    WITH tiled AS (
      SELECT event_type, value,
             NTILE(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM tiled GROUP BY event_type, bucket
    """,
)
def histogram_equi_depth_by_type(spark, sf_dir):
    """Equi-DEPTH histogram (ANALYZE-style statistics): per event type,
    NTILE(4) splits the value distribution into four equal-count buckets
    whose [lo, hi] bounds ARE the quartile boundaries — the optimizer-
    statistics shape where equi-width bins would collapse under skew.
    Tiebreak on event_id makes bucket edges engine-independent. The window
    partitions by event_type, so each type sorts in parallel; a GLOBAL
    equi-depth histogram at 100 TB should come from the mergeable quantile
    sketch instead (ext/sketch.bottomk_quantiles) — a no-partition NTILE
    would funnel the corpus through one task."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("bucket", F.ntile(4).over(w))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "bloom_pruned_join_revenue",
    oracle="""
    SELECT l.l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0) o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey
    """,
)
def bloom_pruned_join_revenue(spark, sf_dir):
    """RUNTIME-FILTER pattern, spelled explicitly with the engine's own
    Bloom sketch: before joining the big fact side (lineitem) to a
    selective dimension subset, every fact row probes a Bloom filter of
    the dimension's join keys (one broadcast row of set bits, no shuffle,
    no join) and only maybe-members proceed to the real join. The Bloom
    can only FALSELY ADMIT rows — never reject a match — and the join
    verifies exactly, so the result is IDENTICAL to the plain join (the
    oracle) while the shuffle carries ~selectivity + fp-rate of the fact
    table instead of all of it. This is what Spark's own
    spark.sql.optimizer.runtimeFilter does implicitly; the explicit form
    works across stages/jobs where the optimizer's can't reach (e.g.
    pre-filtering before a persist or an expensive UDF)."""
    from pypeln_spark.ext import sketch as K

    li, orders = tables(spark, sf_dir, "lineitem", "orders")
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderkey") % 3 == 0)
    ).select("o_orderkey")
    bits = K.bloom_build(dim, "o_orderkey")
    pruned = K.bloom_maybe_contains(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        bits,
        "l_orderkey",
    ).filter(F.col("maybe_member"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        pruned.join(F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


def _zorder_sql(a: str, b: str, bits: int = 10) -> str:
    """DuckDB twin of ext/curation.zorder_key — same bit interleave."""
    terms = []
    for i in range(bits):
        # full parens: DuckDB binds << tighter than &, so `& 1 << j`
        # would parse as `& (1 << j)`
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_layout_events",
    oracle=f"""
    WITH keyed AS (
      SELECT event_id,
             user_id % 1024 AS ua,
             (epoch_us(ts) // 3600000000) % 1024 AS hb,
             {_zorder_sql('(user_id % 1024)',
                          '((epoch_us(ts) // 3600000000) % 1024)')} AS zkey
      FROM events
    ),
    filed AS (
      SELECT *, zkey // 65536 AS file_id FROM keyed
    )
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(ua) AS user_lo, MAX(ua) AS user_hi,
           MIN(hb) AS hour_lo, MAX(hb) AS hour_hi
    FROM filed GROUP BY file_id
    """,
)
def zorder_layout_events(spark, sf_dir):
    """Z-ORDER layout keys (ext/curation.zorder_key): events keyed by the
    Morton interleave of (user bucket, hour bucket), then grouped into
    64Ki-key 'files' — each group's (user, hour) bounding box is what a
    parquet footer would hold after a z-ordered write, and the oracle
    replays the identical bit arithmetic. The point at 100 TB: those boxes
    are TIGHT IN BOTH DIMENSIONS, so filters on either user or time skip
    files on min/max stats alone, where a single-column sort prunes only
    its leading column. (Bucketing uses integer floor division on both
    engines — `DIV` / `//` — because casting a float quotient truncates
    in Spark but rounds in DuckDB.)"""
    from pypeln_spark.ext.curation import zorder_key

    (events,) = tables(spark, sf_dir, "events")
    ua = F.col("user_id") % 1024
    hb = F.expr("unix_micros(ts) DIV 3600000000") % 1024
    keyed = events.select(
        "event_id",
        ua.alias("ua"),
        hb.alias("hb"),
        zorder_key(ua, hb, bits=10).alias("zkey"),
    )
    return (
        keyed.withColumn("file_id", F.expr("zkey DIV 65536"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ua").alias("user_lo"),
            F.max("ua").alias("user_hi"),
            F.min("hb").alias("hour_lo"),
            F.max("hb").alias("hour_hi"),
        )
    )


def _pagerank_oracle(iters: int = 3, d: str = "CAST(0.85 AS DOUBLE)") -> str:
    """Unrolled power-iteration twin of ext/dedup.pagerank: same edge spec
    as the triangles query, source-ordered IEEE left-fold per-vertex sums (the dot_ieee convention), and the
    base/damping terms spelled as DOUBLE-cast literals — DuckDB parses a
    bare 0.85 as DECIMAL and would do decimal arithmetic — so every rank
    is bit-identical to Spark's double evaluation."""
    head = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT d.u AS vertex, d.deg, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM deg d CROSS JOIN nn)
    """
    body = ""
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (SELECT s.v AS vertex, s.u AS u, r.rank / r.deg AS c
             FROM sym s JOIN r{i - 1} r ON s.u = r.vertex),
    s{i} AS (SELECT vertex,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY u)),
                         (acc, x) -> acc + x) AS s
             FROM c{i} GROUP BY vertex),
    r{i} AS (SELECT d.u AS vertex, d.deg,
                    (CAST(1.0 AS DOUBLE) - {d}) / nn.n
                      + {d} * COALESCE(s{i}.s, CAST(0.0 AS DOUBLE)) AS rank
             FROM deg d CROSS JOIN nn
             LEFT JOIN s{i} ON s{i}.vertex = d.u)
    """
    return head + body + f"SELECT vertex, rank FROM r{iters}"


def _copurchase_edges(spark, sf_dir):
    """The part co-purchase edge list (parts sharing an order, every 4th
    key) — ONE definition shared by the triangles and PageRank queries so
    the two graph oracles can never drift. Deliberately NOT routed through
    the session index cache: measured at sf0.1 (min-of-5), the cached
    InMemoryTableScan is a wash or slightly slower than rebuilding
    (triangles 1.77s cached vs 1.55s direct; PageRank 2.21 vs 2.17) —
    AQE pipelines the distinct+self-join build into the consumer at this
    size, while the cache adds a scan barrier. At 100 TB the edge list
    would be a maintained TABLE (write once, scan many), which is a
    storage decision, not a persist() one."""
    (li,) = tables(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        items.alias("a")
        .join(items.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("id_a"), F.col("b.l_partkey").alias("id_b")
        )
    )


def _ppr_oracle(iters: int = 3, d: str = "CAST(0.85 AS DOUBLE)", m: int = 3) -> str:
    """Personalized-PageRank twin: teleport set = the m smallest vertices
    (replayable on both sides); base/initial mass concentrated on it."""
    head = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
    srcs AS (SELECT u FROM deg ORDER BY u LIMIT {m}),
    r0 AS (SELECT d.u AS vertex, d.deg,
                  CASE WHEN d.u IN (SELECT u FROM srcs)
                       THEN CAST(1.0 AS DOUBLE) / CAST({m} AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END AS rank
           FROM deg d)
    """.format(m=m)
    body = ""
    for i in range(1, iters + 1):
        body += f""",
    c{i} AS (SELECT s.v AS vertex, s.u AS u, r.rank / r.deg AS c
             FROM sym s JOIN r{i - 1} r ON s.u = r.vertex),
    s{i} AS (SELECT vertex,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY u)),
                         (acc, x) -> acc + x) AS s
             FROM c{i} GROUP BY vertex),
    r{i} AS (SELECT d.u AS vertex, d.deg,
                    CASE WHEN d.u IN (SELECT u FROM srcs)
                         THEN (CAST(1.0 AS DOUBLE) - {d}) / CAST({m} AS DOUBLE)
                         ELSE CAST(0.0 AS DOUBLE) END
                      + {d} * COALESCE(s{i}.s, CAST(0.0 AS DOUBLE)) AS rank
             FROM deg d
             LEFT JOIN s{i} ON s{i}.vertex = d.u)
    """
    return head + body + f"SELECT vertex, rank FROM r{iters}"


@register("graph_ppr_part_cooccurrence", oracle=_ppr_oracle())
def graph_ppr_part_cooccurrence(spark, sf_dir):
    """PERSONALIZED PageRank (ext/dedup.pagerank with sources) — the
    related-items / recommendation form: the walk teleports to a 3-part
    source set (the graph's three smallest vertex ids — a spec both
    engines can derive), so ranks measure proximity to those parts in the
    co-purchase graph rather than global centrality. Same bit-exact
    ordered-fold gather as global PageRank; the oracle replays teleport
    membership, the concentrated initial mass, and all three iterations."""
    from pypeln_spark.ext.dedup import pagerank

    edges = _copurchase_edges(spark, sf_dir)
    srcs = [
        r.u
        for r in edges.select(F.explode(F.array("id_a", "id_b")).alias("u"))
        .distinct()
        .orderBy("u")
        .limit(3)
        .collect()
    ]
    return pagerank(edges, iters=3, damping=0.85, sources=srcs)


@register("graph_pagerank_part_cooccurrence", oracle=_pagerank_oracle())
def graph_pagerank_part_cooccurrence(spark, sf_dir):
    """PageRank (ext/dedup.pagerank, 3 power iterations, d=0.85) over the
    same part co-purchase graph as the triangles query — the iterative
    Pregel-style algorithm family, fully oracle-replayed: edge
    contributions are order-free IEEE divisions and the per-vertex gather
    is a source-ordered IEEE-double left-fold (no decimal cast anywhere —
    both engines fold neighbor contributions in the same sorted order), so
    DuckDB reproduces every rank bit for bit, unrolled CTE by unrolled
    CTE."""
    from pypeln_spark.ext.dedup import pagerank

    return pagerank(_copurchase_edges(spark, sf_dir), iters=3, damping=0.85)


def _lpa_oracle(iters: int = 3) -> str:
    """Unrolled synchronous label-propagation twin of
    ext/dedup.label_propagation: same edge spec as the other graph queries,
    per-round most-frequent-neighbor-label argmax with the (count DESC,
    label ASC) total-order tie-break — integer-only, so bit-identity needs
    no float convention at all."""
    head = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    l0 AS (SELECT DISTINCT u AS vertex, u AS label FROM sym)
    """
    body = ""
    for i in range(1, iters + 1):
        body += f""",
    cnt{i} AS (SELECT s.v AS vertex, l.label, COUNT(*) AS c
               FROM sym s JOIN l{i - 1} l ON l.vertex = s.u
               GROUP BY s.v, l.label),
    l{i} AS (SELECT vertex, label FROM (
               SELECT vertex, label,
                      ROW_NUMBER() OVER (PARTITION BY vertex
                                         ORDER BY c DESC, label) AS rn
               FROM cnt{i}) WHERE rn = 1)
    """
    return head + body + f"SELECT vertex, label FROM l{iters}"


KCORE_K = 18
KCORE_ROUNDS = 3


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled iterated-peel twin of ext/dedup.kcore_prune: per round,
    degrees over the current edge set, drop vertices with degree < k,
    keep edges with both endpoints surviving. Integer-only."""
    head = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e0 AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs)
    """
    body = ""
    for i in range(1, rounds + 1):
        body += f""",
    d{i} AS (SELECT u, COUNT(*) AS c FROM e{i - 1} GROUP BY u),
    k{i} AS (SELECT u FROM d{i} WHERE c >= {k}),
    e{i} AS (SELECT e.u, e.v FROM e{i - 1} e
             JOIN k{i} ka ON ka.u = e.u
             JOIN k{i} kb ON kb.u = e.v)
    """
    return head + body + (
        f"SELECT u AS vertex, COUNT(*) AS degree FROM e{rounds} GROUP BY u"
    )


@register("graph_kcore_part_cooccurrence", oracle=_kcore_oracle())
def graph_kcore_part_cooccurrence(spark, sf_dir):
    """Bounded-round k-core peeling (ext/dedup.kcore_prune, k=18, 3
    rounds) over the shared part co-purchase graph — the density filter a
    graph pipeline runs before community/embedding passes (peripheral
    low-degree vertices drop, and the CASCADE matters: removing them can
    drag former neighbors under k in later rounds). Fixed round count is
    part of the spec, so the unrolled SQL oracle replays every peel
    exactly; integer-only state."""
    from pypeln_spark.ext.dedup import kcore_prune

    return kcore_prune(
        _copurchase_edges(spark, sf_dir), k=KCORE_K, rounds=KCORE_ROUNDS
    )


@register("graph_lpa_part_cooccurrence", oracle=_lpa_oracle())
def graph_lpa_part_cooccurrence(spark, sf_dir):
    """Label-propagation community detection (ext/dedup.label_propagation,
    3 synchronous rounds, deterministic (count DESC, label ASC) tie-break)
    over the shared part co-purchase graph — finds DENSE regions inside a
    component where connected components would collapse everything to one
    label. Integer-only state, so the unrolled SQL oracle replays every
    round exactly."""
    from pypeln_spark.ext.dedup import label_propagation

    return label_propagation(_copurchase_edges(spark, sf_dir), iters=3)


@register(
    "graph_triangles_part_cooccurrence",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_partkey % 4 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM pairs e1
      JOIN pairs e2 ON e1.v = e2.u
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      SELECT unnest([x, y, z]) AS vertex FROM tri
    ) GROUP BY vertex
    """,
)
def graph_triangles_part_cooccurrence(spark, sf_dir):
    """Triangle counting (ext/dedup.triangle_count) over the market-basket
    graph: parts (every 4th key, to keep the co-occurrence graph honest at
    sf0.01) are connected when they appear in the same order; a part's
    triangle count measures how clustered its co-purchase neighborhood is
    — the community-density signal CC can't see (a chain and a clique have
    the same components). Two equi-joins over the oriented edge list; the
    oracle replays the same wedge-close formulation."""
    from pypeln_spark.ext.dedup import triangle_count

    return triangle_count(_copurchase_edges(spark, sf_dir))


DRIFT_PCT = 5  # flag when |p_a - p_b| > 5% (integer cross-multiplied)


@register(
    "quality_drift_events_cohorts",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, CAST(user_id % 2 = 0 AS INT) AS in_a FROM events
    ),
    per AS (
      SELECT event_type,
             CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - in_a) AS BIGINT) AS n_b
      FROM tagged GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b
      FROM per
    )
    SELECT p.event_type, p.n_a, p.n_b,
           CAST(p.n_a AS DOUBLE) / CAST(t.t_a AS DOUBLE) AS p_a,
           CAST(p.n_b AS DOUBLE) / CAST(t.t_b AS DOUBLE) AS p_b,
           ABS(p.n_a * t.t_b - p.n_b * t.t_a) * 100
             > {DRIFT_PCT} * t.t_a * t.t_b AS drifted
    FROM per p CROSS JOIN tot t
    """,
)
def quality_drift_events_cohorts(spark, sf_dir):
    """Distribution-drift monitor: compare the event_type mix between two
    cohorts (the A/B or train-vs-serving shape) — per-type counts, shares,
    and a drift flag when the share gap exceeds 5 POINTS. The flag is
    integer cross-multiplied (|n_a·t_b − n_b·t_a|·100 > 5·t_a·t_b), so no
    float comparison decides it; each reported share is one IEEE division
    of exact integers, bit-identical cross-engine. Scale: one scan with
    partial-aggregated counts on the tiny type key space, a one-row total
    broadcast back — log-free by design (PSI's ln() is libm-dependent and
    would break bit-reproducibility; the share-gap test is the auditable
    stand-in)."""
    (events,) = tables(spark, sf_dir, "events")
    in_a = (F.col("user_id") % 2 == 0).cast("int")
    per = (
        events.select("event_type", in_a.alias("in_a"))
        .groupBy("event_type")
        .agg(
            F.sum("in_a").alias("n_a"),
            F.sum(F.lit(1) - F.col("in_a")).alias("n_b"),
        )
    )
    tot = per.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    return per.join(F.broadcast(tot)).select(
        "event_type",
        "n_a",
        "n_b",
        (F.col("n_a").cast("double") / F.col("t_a").cast("double")).alias("p_a"),
        (F.col("n_b").cast("double") / F.col("t_b").cast("double")).alias("p_b"),
        (
            F.abs(F.col("n_a") * F.col("t_b") - F.col("n_b") * F.col("t_a")) * 100
            > DRIFT_PCT * F.col("t_a") * F.col("t_b")
        ).alias("drifted"),
    )


@register(
    "quality_ks_test_value_cohorts",
    oracle="""
    WITH pts AS (
      SELECT value AS v,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS b_cnt
      FROM events GROUP BY value
    ),
    tot AS (
      SELECT CAST(SUM(a_cnt) AS BIGINT) AS n_a, CAST(SUM(b_cnt) AS BIGINT) AS n_b
      FROM pts
    ),
    cum AS (
      SELECT v,
             CAST(SUM(a_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             CAST(SUM(b_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
      FROM pts
    ),
    d AS (
      SELECT c.v, ABS(c.ca * t.n_b - c.cb * t.n_a) AS di
      FROM cum c CROSS JOIN tot t
    ),
    mx AS (SELECT MAX(di) AS m FROM d)
    SELECT t.n_a, t.n_b,
           CAST(mx.m AS DOUBLE) / CAST(t.n_a * t.n_b AS DOUBLE) AS d_stat,
           (SELECT MAX(v) FROM d WHERE di = mx.m) AS at_value
    FROM tot t CROSS JOIN mx
    """,
)
def quality_ks_test_value_cohorts(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test between the user-parity cohorts
    on event value: D = max |F_a(v) − F_b(v)| over all observed points,
    computed EXACTLY — the CDF gap at each point is the integer
    |ca·n_b − cb·n_a|, the max is an integer max, and only the final
    D = max / (n_a·n_b) is one IEEE division (log-free, rank-free, so it
    replays bit-identically; ties at the max break to the LARGEST value).
    Scale: a naive global-order cumulative window funnels every distinct
    value through one task; instead the CDF is built two-level — per-
    (floor(v)) bucket windows plus a tiny bucket-offset prefix sum
    broadcast back (the shard_manifest / gapfill discipline), so no task
    ever sees more than a bucket's worth of points."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    in_a = (F.col("user_id") % 2 == 0).cast("long")
    pts = events.groupBy(F.col("value").alias("v")).agg(
        F.sum(in_a).alias("a_cnt"), F.sum(1 - in_a).alias("b_cnt")
    ).withColumn("bucket", F.floor("v").cast("long"))
    btot = pts.groupBy("bucket").agg(
        F.sum("a_cnt").alias("ba"), F.sum("b_cnt").alias("bb")
    )
    # unpartitioned by design: btot is post-aggregation, one row per value
    # bucket (|distinct floor(value)| — dozens here, bounded by value range
    # not corpus size), so the single-task sort never sees raw events
    woff = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.select(
        "bucket",
        F.coalesce(F.sum("ba").over(woff), F.lit(0)).cast("long").alias("off_a"),
        F.coalesce(F.sum("bb").over(woff), F.lit(0)).cast("long").alias("off_b"),
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.join(F.broadcast(offs), "bucket").select(
        "v",
        (F.col("off_a") + F.sum("a_cnt").over(win)).cast("long").alias("ca"),
        (F.col("off_b") + F.sum("b_cnt").over(win)).cast("long").alias("cb"),
    )
    tot = pts.agg(
        F.sum("a_cnt").cast("long").alias("n_a"),
        F.sum("b_cnt").cast("long").alias("n_b"),
    )
    d = cum.join(F.broadcast(tot)).select(
        "n_a", "n_b", "v",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias("di"),
    )
    return d.groupBy("n_a", "n_b").agg(
        (F.max("di").cast("double") / (F.col("n_a") * F.col("n_b")).cast("double"))
        .alias("d_stat"),
        F.max_by("v", F.struct(F.col("di"), F.col("v"))).alias("at_value"),
    )
