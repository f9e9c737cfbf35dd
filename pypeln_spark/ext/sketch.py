"""Mergeable sketches over the frozen md5 hash family (ext/hashing.py).

Three sketches, one design rule: every estimator is *exactly reproducible
cross-engine*, so sketch state AND estimates can be value-checked against
the DuckDB oracle — unlike engine-native approx fns (approx_count_distinct,
approx_percentile, HLL/t-digest), which share no spec across engines.

- kmv_sketch — KMV (K-Minimum-Values) distinct count: a group's sketch is
  its k smallest distinct hashes; estimator (k-1) * H / kth_min (hashes
  uniform on [0, H)). The reproducible HLL alternative.
- cms_sketch / cms_estimate — Count-Min point frequency: d×w counter
  matrix; estimate = min over rows of the value's counter. Linear, so
  merge is counter addition.
- bottomk_quantiles — quantiles from the uniform row sample given by the k
  smallest key-hashes; rank-pick estimator, no interpolation.

Scale shape (the point): each is a two-phase aggregate like Spark lowers
sum() — PARTIAL state per (group, salt) sub-key or (group, j, bucket) key,
then an associative lossless FINAL merge — so the result is provably
independent of partitioning (tested), which is also what lets the oracle
compute it single-node.

State-bound honesty (ADVICE r1): only CMS has truly bounded aggregation
state (d×w counters). The KMV / bottom-k paths use collect_set /
collect_list, whose AGGREGATION BUFFER holds the full distinct-hash set
(resp. row list) per (group, salt) before the slice to k — the slice is a
post-aggregation projection, not an incremental bound. The salt fan-out
divides that buffer ×salts and map-side partial aggregation dedups within
a partition, but worst-case partial state is O(distinct per group / salts),
NOT O(k). Only the OUTPUT is bounded at k. For genuinely bounded
incremental state use kmv_sketch_bounded (mapInPandas partial bottom-k,
same result bit-for-bit) — the trade is a Python hop per partition.
"""

from __future__ import annotations

import typing as tp

from pyspark.sql import DataFrame, functions as F

from .hashing import MINHASH_PARAMS, P31, h31, py_h31


def _kmv_estimate(merged: DataFrame, k: int) -> DataFrame:
    """Attach the KMV estimator to a merged sketch: est = (k-1)*H / kth_min,
    exact (= |kmin|) when the group has fewer than k distinct hashes."""
    kth = F.element_at(F.col("kmin"), k).cast("double")
    est = F.when(
        F.size("kmin") < k, F.size("kmin").cast("double")
    ).otherwise(F.lit(float((k - 1) * P31)) / kth)
    return merged.withColumn("est_distinct", est)


def kmv_sketch(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    k: int = 64,
    salts: int = 8,
) -> DataFrame:
    """Per-group KMV sketch + estimate: (group..., kmin: array<long>,
    est_distinct: double). est is exact (= |kmin|) when the group has fewer
    than k distinct hashes."""
    h = h31(F.col(value_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(salts))
    partial = (
        df.withColumn("_h", h)
        .withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_part"))
    )
    merged = partial.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))), 1, k
        ).alias("kmin")
    )
    return _kmv_estimate(merged, k)


def kmv_sketch_bounded(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV with genuinely O(k) incremental state — the bounded counterpart
    to kmv_sketch's collect_set path (whose aggregation buffer is
    O(distinct per group); see the module docstring).

    A mapInPandas pass streams each partition's Arrow batches through a
    bounded per-group heap, keeping only the k smallest DISTINCT hashes —
    memory O(groups·k) per partition no matter how many rows flow through.
    The ≤k-row partials then merge in one groupBy whose collect_set input
    is bounded at k·partitions rows per group. Bit-identical to kmv_sketch
    over the same frozen md5 family (py_h31 is h31's lockstep Python twin);
    the trade is a Python/Arrow hop, so prefer kmv_sketch until group
    value-sets are large enough to spill its aggregation buffers.

    ``value_col`` must be integer/string typed: the Python side hashes
    str(value), matching Spark's cast("string") for those types only.
    NULL/NaN values are skipped to match Catalyst's null semantics (h31 of
    NULL is NULL and collect_set drops it) — without the skip they'd hash
    as the strings 'None'/'nan' and pollute the sketch (ADVICE r2)."""
    import heapq

    from pyspark.sql import types as T

    gcols = list(group_cols)
    out_schema = T.StructType(
        [df.schema[c] for c in gcols] + [T.StructField("_h", T.LongType())]
    )

    def partial(batches: tp.Iterator) -> tp.Iterator:
        import pandas as pd

        # group key -> (max-heap of negated hashes, member set), both ≤ k
        state: dict = {}
        for pdf in batches:
            groups = list(zip(*[pdf[c] for c in gcols])) if gcols else [()] * len(pdf)
            for gv, v in zip(groups, pdf[value_col]):
                if v is None or v != v:  # null/NaN → Catalyst drops them
                    continue
                h = py_h31(str(v))
                heap, members = state.setdefault(gv, ([], set()))
                if h in members:
                    continue
                if len(heap) < k:
                    heapq.heappush(heap, -h)
                    members.add(h)
                elif h < -heap[0]:
                    evicted = -heapq.heappushpop(heap, -h)
                    members.discard(evicted)
                    members.add(h)
        rows = [
            tuple(gv) + (h,)
            for gv, (_, members) in state.items()
            for h in members
        ]
        if rows:  # empty partitions emit nothing (empty object dtypes
            # don't convert cleanly to the Arrow long schema)
            yield pd.DataFrame(rows, columns=gcols + ["_h"])

    partials = df.select(*gcols, value_col).mapInPandas(partial, schema=out_schema)
    merged = partials.groupBy(*gcols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("kmin")
    )
    return _kmv_estimate(merged, k)


def bottom_k_update(cur: tp.Sequence[int], hashes: tp.Iterable, k: int) -> list:
    """Merge a stream of hash values into an existing bottom-k distinct set,
    using O(k) memory regardless of stream length — the pure update kernel
    shared by kmv_sketch_bounded's per-partition pass and the streaming
    state handler. NULL/NaN hashes are skipped (Catalyst null semantics).
    Returns the new sorted bottom-k list (≤ k values)."""
    import heapq

    heap = [-h for h in cur]  # max-heap of negated hashes
    heapq.heapify(heap)
    members = set(cur)
    for h in hashes:
        if h is None or h != h:
            continue
        h = int(h)
        if h in members:
            continue
        if len(heap) < k:
            heapq.heappush(heap, -h)
            members.add(h)
        elif h < -heap[0]:
            evicted = -heapq.heappushpop(heap, -h)
            members.discard(evicted)
            members.add(h)
    return sorted(members)


def kmv_stateful_stream(
    grouped_df: DataFrame,
    group_cols: tp.Sequence[str],
    k: int = 64,
) -> DataFrame:
    """KMV sketch as TRULY BOUNDED streaming state: applyInPandasWithState
    keeps exactly the bottom-k distinct hashes per group — checkpoint state
    is O(k) longs per group no matter how many rows stream through, unlike
    the collect_set aggregation whose state grows with per-group distincts
    (the module docstring's honesty note; SCALING.md's claim now holds).

    ``grouped_df`` must be a STREAMING frame carrying ``group_cols`` plus a
    precomputed ``_h`` long column (h31 of the value — computed Spark-side
    so the frozen md5 family stays engine-checkable). Emits one row per
    group PER TRIGGER in update mode: (group..., kmin_csv, n, kth,
    version); downstream takes the max-version row per group — kmin only
    ever improves, so every emitted version is a valid sketch of the data
    seen so far (the property that makes resume-from-checkpoint safe).
    The update kernel is bottom_k_update — O(k) working memory too."""
    from pyspark.sql import types as T

    gcols = list(group_cols)
    gfields = [grouped_df.schema[c] for c in gcols]
    out_schema = T.StructType(
        gfields
        + [
            T.StructField("kmin_csv", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("kth", T.LongType()),
            T.StructField("version", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("kmin", T.ArrayType(T.LongType())),
            T.StructField("version", T.LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            cur, version = state.get
            cur = list(cur)
        else:
            cur, version = [], 0
        for pdf in pdfs:
            cur = bottom_k_update(cur, pdf["_h"], k)
        version += 1
        state.update((cur, version))
        n = len(cur)
        kth = cur[k - 1] if n >= k else None
        yield pd.DataFrame(
            [tuple(key) + (",".join(str(h) for h in cur), n, kth, version)],
            columns=gcols + ["kmin_csv", "n", "kth", "version"],
        )

    return grouped_df.groupBy(*gcols).applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def _cms_buckets(value_col: str, d: int, w: int) -> F.Column:
    """array<long> of the d CMS row-buckets for a value: row j's bucket is
    ((a_j*h31(v) + b_j) mod P31) mod w over the frozen minhash family —
    a_j*h < 2^62, so everything stays in exact int64 on any engine."""
    h = h31(F.col(value_col).cast("string"))
    return F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(P31)) % F.lit(w)
            for a, b in MINHASH_PARAMS[:d]
        ]
    )


def cms_sketch(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Per-group Count-Min sketch: (group..., cms: array<array<long>>), d
    rows × w counters; cms[j][b] = #rows whose value hashes to bucket b under
    row-hash j. The sketch is LINEAR (counter-wise sums), so merging partial
    sketches is elementwise addition — partition-invariant by construction.

    Scale shape: one explode (×d) into a groupBy over (group, j, bucket) —
    key cardinality bounded by |groups|·d·w regardless of input size, so
    map-side partial aggregation collapses the shuffle to ~|groups|·d·w rows;
    the dense-array assembly then touches only that bounded relation."""
    rows = df.withColumn("_bk", _cms_buckets(value_col, d, w)).select(
        *group_cols, F.posexplode("_bk").alias("_j", "_b")
    )
    counts = rows.groupBy(*group_cols, "_j", "_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    dense = counts.groupBy(*group_cols, "_j").agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m")
    ).select(
        *group_cols,
        "_j",
        F.transform(
            F.sequence(F.lit(0), F.lit(w - 1)),
            lambda b: F.coalesce(F.element_at(F.col("_m"), b.cast("long")), F.lit(0)),
        ).alias("_row"),
    )
    return dense.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_j", "_row"))), lambda x: x["_row"]
        ).alias("cms")
    )


def cms_estimate(
    sketch_df: DataFrame,
    items_df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-frequency estimates for (group, value) rows in items_df against
    a cms_sketch over the same (d, w, hash family): adds `n_est` = min over
    rows j of cms[j][bucket_j(value)] — the classic CMS upper bound, exact-
    deterministic so it can be value-checked cross-engine. The sketch side is
    tiny (one row per group), so the join broadcasts."""
    bk = _cms_buckets(value_col, d, w)
    est = F.least(
        *[
            F.element_at(
                F.element_at("cms", j + 1), (F.element_at("_bk", j + 1) + 1).cast("int")
            )
            for j in range(d)
        ]
    )
    return (
        items_df.withColumn("_bk", bk)
        .join(F.broadcast(sketch_df), list(group_cols))
        .withColumn("n_est", est)
        .drop("_bk", "cms")
    )


# ---------------------------------------------------------------------------
# HyperLogLog over the md5 hex string — the cross-engine-reproducible HLL.
#
# Engine-native HLLs (Spark approx_count_distinct, DuckDB approx_distinct)
# share no spec, so their outputs can never be value-checked against each
# other. This one derives everything from the md5 hex characters, which ARE
# identical everywhere:
#   bucket = first 2 hex chars            (m = 256 registers, b = 8 bits)
#   rem    = next 13 hex chars            (52 independent hash bits)
#   rho    = 1 + #leading zero BITS of rem (1..53; all-zero rem -> 53)
# rho comes from string ops (ltrim of '0' + a 16-way CASE on the first
# non-zero hex digit), register merge is max(), and the harmonic sum
# Z = sum_j 2^(-M_j) is carried as the EXACT integer S = sum_j 2^(53-M_j)
# (M_j=0 for empty registers; S <= 256*2^53 = 2^61 fits int64 and is
# associative/partition-invariant, unlike a float sum). The only floats are
# one final division (IEEE-exact on both engines) and the linear-counting
# table, which is precomputed in Python ONCE and embedded as the same
# literal array on both sides — so ln() never runs inside either engine.
# ---------------------------------------------------------------------------

HLL_B = 8  # register-index bits -> m = 256
HLL_M = 1 << HLL_B
HLL_REM_HEX = 13  # hex chars of rho material -> max rho = 52 + 1
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator of the raw estimate: alpha * m^2 * 2^53 (S carries the 2^53 scale)
HLL_RAW_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)
# linear-counting estimates m*ln(m/V) for V = 1..m, computed once here and
# embedded as literals in BOTH the Spark plan and the DuckDB oracle — the
# same float is parsed on each side, so engine libm differences cannot leak
import math as _math

HLL_LIN_TABLE = [HLL_M * _math.log(HLL_M / v) for v in range(1, HLL_M + 1)]


def hll_sketch(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group HLL distinct-count: (group..., hll_sum_pow, empty_buckets,
    est_distinct). Classic Flajolet HLL with the small-range linear-counting
    correction; every output is deterministic cross-engine (see banner).

    Scale shape: ONE groupBy over (group, bucket) — key cardinality bounded
    at |groups|*256 whatever the input size, so map-side partial max()
    collapses the shuffle to ~|groups|*256 rows; the final per-group merge
    touches <=256 rows per group. This is the truly-bounded-state distinct
    sketch (cf. kmv_sketch's O(distinct) aggregation buffers): partial state
    is <=256 longs per group per partition, exactly how an HLL behaves on a
    1000-executor cluster."""
    v = F.col(value_col).cast("string")
    bucket, rho = hll_bucket_rho(v)
    regs = (
        df.filter(v.isNotNull())
        .select(*group_cols, bucket.alias("_bkt"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bkt")
        .agg(F.max("_rho").alias("_r"))
    )
    return hll_finalize(regs, group_cols)


def hll_bucket_rho(value: F.Column) -> tp.Tuple[F.Column, F.Column]:
    """(bucket, rho) for one value — the per-row piece of hll_sketch, shared
    with the streaming register maintenance path."""
    hexs = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(hexs, 1, 2), 16, 10).cast("long")
    stripped = F.regexp_replace(F.substring(hexs, 3, HLL_REM_HEX), "^0+", "")
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(stripped == "", F.lit(53)).otherwise(
        (F.lit(HLL_REM_HEX) - F.length(stripped)) * 4 + 1 + extra
    )
    return bucket, rho


def hll_finalize(regs: DataFrame, group_cols: tp.Sequence[str]) -> DataFrame:
    """Merge a register relation (group..., _bkt, _r) into per-group
    (hll_sum_pow, empty_buckets, est_distinct). Registers are mergeable by
    max(), so this accepts partial registers from ANY source — the batch
    groupBy above or a streamed register table."""
    # integer harmonic sum: present buckets contribute 2^(53-r), the
    # (m - present) empty buckets contribute 2^53 each
    term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - _r AS INT))")
    merged = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    s = (
        F.col("_s_present")
        + (F.lit(HLL_M) - F.col("_n_present")) * F.lit(1 << 53)
    ).alias("hll_sum_pow")
    empty = (F.lit(HLL_M) - F.col("_n_present")).cast("long").alias("empty_buckets")
    out = merged.select(*group_cols, s, empty)
    raw = F.lit(HLL_RAW_NUM) / F.col("hll_sum_pow").cast("double")
    lin = F.element_at(
        F.array(*[F.lit(x) for x in HLL_LIN_TABLE]),
        F.col("empty_buckets").cast("int"),
    )
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("empty_buckets") > 0), lin
    ).otherwise(raw)
    return out.withColumn("est_distinct", est)


def _dlit(x: float) -> str:
    """Spell a Python float as a DuckDB DOUBLE literal. A bare decimal
    literal ('15.457410813160315') parses as DECIMAL there, and unifying a
    256-element list to one decimal scale rounds the last ulp away from the
    Spark plan's true double — an exponent suffix forces DOUBLE parsing."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) else s + "e0"


def sql_hll_sketch(
    table_expr: str,
    group_expr: tp.Union[str, tp.Sequence[str]],
    value_expr: str,
    group_alias: tp.Union[str, tp.Sequence[str]] = "g",
) -> str:
    """DuckDB spelling of hll_sketch — generated from the SAME constants
    (HLL_RAW_NUM, HLL_LIN_TABLE) so the two can never drift. Returns a
    SELECT with columns ({group_alias...}, hll_sum_pow, empty_buckets,
    est_distinct). group_expr/group_alias may be parallel lists for
    multi-column grouping (e.g. the streaming daily windows)."""
    if isinstance(group_expr, str):
        group_expr, group_alias = [group_expr], [group_alias]  # type: ignore[list-item]
    g_sel = ", ".join(f"{e} AS {a}" for e, a in zip(group_expr, group_alias))
    g_names = ", ".join(group_alias)
    g_nums = ", ".join(str(i + 1) for i in range(len(group_expr) + 1))
    g_merge_nums = ", ".join(str(i + 1) for i in range(len(group_expr)))
    stripped = f"regexp_replace(substr(md5(CAST({value_expr} AS VARCHAR)), 3, {HLL_REM_HEX}), '^0+', '')"
    rho = (
        f"(CASE WHEN {stripped} = '' THEN 53 ELSE "
        f"({HLL_REM_HEX} - length({stripped})) * 4 + 1 + "
        f"(CASE substr({stripped}, 1, 1) "
        f"WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        f"WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        f"ELSE 0 END) END)"
    )
    bucket = (
        f"CAST(concat('0x', substr(md5(CAST({value_expr} AS VARCHAR)), 1, 2)) AS BIGINT)"
    )
    lin_list = ", ".join(_dlit(x) for x in HLL_LIN_TABLE)
    return f"""
    WITH _hregs AS (
      SELECT {g_sel}, {bucket} AS _bkt, MAX({rho}) AS _r
      FROM {table_expr} WHERE {value_expr} IS NOT NULL
      GROUP BY {g_nums}
    ),
    _hmerged AS (
      SELECT {g_names},
             CAST(SUM((CAST(1 AS BIGINT) << (53 - _r)))
               + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT)
               AS hll_sum_pow,
             CAST({HLL_M} - COUNT(*) AS BIGINT) AS empty_buckets
      FROM _hregs GROUP BY {g_merge_nums}
    )
    SELECT {g_names}, hll_sum_pow, empty_buckets,
           CASE WHEN ({_dlit(HLL_RAW_NUM)} / CAST(hll_sum_pow AS DOUBLE)) <= {_dlit(2.5 * HLL_M)}
                 AND empty_buckets > 0
                THEN list_extract([{lin_list}], CAST(empty_buckets AS INT))
                ELSE {_dlit(HLL_RAW_NUM)} / CAST(hll_sum_pow AS DOUBLE)
           END AS est_distinct
    FROM _hmerged
    """


def bottomk_quantiles(
    df: DataFrame,
    group_cols: tp.Sequence[str],
    key_col: str,
    value_col: str,
    k: int = 128,
    probs: tp.Sequence[float] = (0.5, 0.9),
    salts: int = 8,
) -> DataFrame:
    """Per-group quantile estimates from a bottom-k uniform row sample:
    keep the k rows whose KEY hashes smallest (key_col must be unique per
    row — e.g. the table's id — so the sample is uniform over ROWS and the
    estimates target multiset quantiles, not distinct-value quantiles).
    Output: (group..., m_sample, est_p{NN}...). Estimator is the sample
    value at rank max(1, ceil(p*m)) — pure integer/rank arithmetic, no
    interpolation, so estimates are bit-identical cross-engine; groups
    smaller than k are sampled whole, making their quantiles exact.

    Scale shape: same two-phase partial/final as kmv_sketch — per-(group,
    salt) bottom-k sub-samples (state ≤ k structs each), then a lossless
    k-smallest merge; the result is independent of partitioning."""
    h = h31(F.col(key_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(salts))
    pair = F.struct(h.alias("_h"), F.col(value_col).alias("_v"))
    partial = (
        df.withColumn("_pair", pair)
        .withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_list("_pair")), 1, k).alias("_part"))
    )
    merged = partial.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_part"))), 1, k
        ).alias("_kmin")
    )
    vals = F.array_sort(F.transform(F.col("_kmin"), lambda x: x["_v"]))
    out = merged.withColumn("_vals", vals).withColumn(
        "m_sample", F.size("_vals").cast("long")
    )
    for p in probs:
        rank = F.greatest(F.lit(1), F.ceil(F.lit(float(p)) * F.size("_vals")))
        out = out.withColumn(
            f"est_p{int(round(p * 100))}",
            F.element_at("_vals", rank.cast("int")),
        )
    return out.drop("_kmin", "_vals")


def bloom_build(
    df: DataFrame,
    value_col: str,
    m: int = 8192,
    kh: int = 3,
) -> DataFrame:
    """Build a Bloom filter over a value column: ONE row holding the sorted
    array of set bit positions. Bit j for value v: ((a_j·h31(v)+b_j) mod
    P31) mod m, over the frozen MINHASH_PARAMS family — fully replayable in
    SQL, like every sketch here.

    Scale shape: the set-bit table is a distinct over ≤ kh rows per input
    row, partial-aggregated map-side down to ≤ m values per partition, so
    the shuffle is bounded by m × partitions whatever the input size; the
    final collect_list array is ≤ m ints (m=8192 → 64 KB) — always
    broadcastable. This is the classic pre-filter for anti-joins against a
    huge build side (decontamination block-lists, seen-before URL sets):
    ship the 64 KB filter instead of shuffling the probe side."""
    h = h31(F.col(value_col).cast("string"))
    positions = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(P31)) % F.lit(m)
            for a, b in MINHASH_PARAMS[:kh]
        ]
    )
    return (
        df.select(F.explode(positions).alias("bit"))
        .distinct()
        .agg(F.array_sort(F.collect_list("bit")).alias("bits"))
    )


def bloom_maybe_contains(
    probe: DataFrame,
    bits: DataFrame,
    value_col: str,
    m: int = 8192,
    kh: int = 3,
) -> DataFrame:
    """Probe a Bloom filter: adds ``maybe_member`` (true ⇔ ALL kh bit
    positions of the probe value are set — false positives possible, false
    negatives impossible). The one-row bits frame broadcasts; the probe
    side is a narrow projection (no shuffle, no join key)."""
    h = h31(F.col(value_col).cast("string"))
    positions = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(P31)) % F.lit(m)
            for a, b in MINHASH_PARAMS[:kh]
        ]
    )
    return probe.join(F.broadcast(bits)).withColumn(
        "maybe_member",
        F.forall(positions, lambda p: F.array_contains(F.col("bits"), p)),
    )
