"""Sources & sinks beyond from_iterable/to_iterable.

The reference has NO connectors — all IO happens inside user fns
(SURVEY.md §2.2). On Spark the native readers are the scale path: parquet
scans get predicate pushdown + column pruning + partition pruning from
Catalyst for free, which is what makes the same query viable at 100 TB.
"""

from __future__ import annotations

import os
import typing as tp

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stage import Stage

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _spark(spark: tp.Optional[SparkSession]) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark()


def read_parquet(path: str, spark: tp.Optional[SparkSession] = None) -> Stage:
    return Stage(_spark(spark).read.parquet(path))


def read_csv(path: str, spark: tp.Optional[SparkSession] = None, **options) -> Stage:
    options.setdefault("header", True)
    return Stage(_spark(spark).read.options(**options).csv(path))


def read_json(
    path: str, spark: tp.Optional[SparkSession] = None, schema=None, **options
) -> Stage:
    reader = _spark(spark).read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return Stage(reader.json(path))


def read_orc(path: str, spark: tp.Optional[SparkSession] = None) -> Stage:
    """ORC scan — same pushdown/pruning story as parquet (both columnar
    formats ride Spark's DataSource v2 filters)."""
    return Stage(_spark(spark).read.orc(path))


def read_text(
    path: str, spark: tp.Optional[SparkSession] = None, whole: bool = False
) -> Stage:
    """Raw text source: one row per line (`value: string`) — the entry
    format for line-delimited corpora. ``whole=True`` reads one row per
    FILE (wholetext), the per-document layout small crawls arrive in."""
    return Stage(_spark(spark).read.text(path, wholetext=whole))


def load_tables(
    sf_dir: str, spark: tp.Optional[SparkSession] = None, register_views: bool = True
) -> tp.Dict[str, DataFrame]:
    """Load every testdata table from an sf directory; optionally register
    each as a temp view so spark.sql can reference it by name (matching the
    DuckDB oracle's pre-registered views)."""
    spark = _spark(spark)
    out: tp.Dict[str, DataFrame] = {}
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            out[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return out


def _writer(stage_or_df, mode: str, partition_by):
    df = stage_or_df.df if isinstance(stage_or_df, Stage) else stage_or_df
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_parquet(stage_or_df, path: str, mode: str = "overwrite", partition_by=None):
    _writer(stage_or_df, mode, partition_by).parquet(path)


def write_orc(stage_or_df, path: str, mode: str = "overwrite", partition_by=None):
    _writer(stage_or_df, mode, partition_by).orc(path)


def write_jsonl(stage_or_df, path: str, mode: str = "overwrite", partition_by=None):
    """Line-delimited JSON — the interchange format most LLM-data tooling
    speaks. Spark's json writer is jsonl by construction (one object per
    line per part file)."""
    _writer(stage_or_df, mode, partition_by).json(path)


def write_csv(
    stage_or_df, path: str, mode: str = "overwrite", partition_by=None, **options
):
    options.setdefault("header", True)
    _writer(stage_or_df, mode, partition_by).options(**options).csv(path)


def read_xml(
    path: str,
    row_tag: str = "row",
    spark: tp.Optional[SparkSession] = None,
    schema=None,
    **options,
) -> Stage:
    """XML source (built into Spark 4 — no external package): one row per
    ``row_tag`` element, schema inferred unless given. Attributes surface
    as ``_attr`` columns; nested elements become structs/arrays."""
    r = _spark(spark).read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return Stage(r.load(path))


def write_xml(
    stage_or_df,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    root_tag: str = "rows",
    row_tag: str = "row",
    **options,
):
    """XML sink (Spark 4 built-in). Avro, by contrast, is NOT loadable here:
    it ships as an external module (spark-avro jar) that this environment
    doesn't carry — use parquet/orc for columnar interchange instead."""
    (
        _writer(stage_or_df, mode, partition_by)
        .format("xml")
        .option("rootTag", root_tag)
        .option("rowTag", row_tag)
        .options(**options)
        .save(path)
    )


def write_bucketed(
    stage_or_df,
    table: str,
    bucket_cols,
    n_buckets: int = 8,
    sort_cols=None,
    mode: str = "overwrite",
):
    """Hash-BUCKETED managed table — the co-location primitive for repeated
    big-big joins and aggregations. Rows are hash-assigned to ``n_buckets``
    files per partition by ``bucket_cols`` AT WRITE TIME; every later join
    or groupBy on those keys between tables bucketed the same way (same
    keys, same bucket count) reads co-located buckets and skips the
    Exchange entirely — the shuffle is paid ONCE at write, then amortized
    over every downstream query. ``sort_cols`` additionally sorts within
    buckets, letting sort-merge joins skip their Sort. This is the 100 TB
    answer for fact-to-fact joins where neither side broadcasts: two
    bucketed scans, zero shuffle (pinned by a plan contract in
    tests/test_plans.py). Bucketing metadata lives in the catalog, so the
    sink is saveAsTable (spark-warehouse), not a bare path."""
    df = stage_or_df.df if isinstance(stage_or_df, Stage) else stage_or_df
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(table: str, spark: tp.Optional[SparkSession] = None) -> Stage:
    """Catalog table → Stage (bucketed tables keep their bucket spec)."""
    return Stage(_spark(spark).table(table))


def overwrite_partitions(stage_or_df, path: str, partition_by):
    """DYNAMIC partition overwrite: rewrite ONLY the partitions present in
    the incoming frame; every other partition on disk is untouched. This is
    the sink half of the merge story (relational.merge_upsert): a merge
    touching 0.1% of partitions rewrites 0.1% of the data — under the
    STATIC default, mode("overwrite") would first delete the whole root.
    The partitionOverwriteMode conf is read at write time, so it is scoped
    around this one write and restored (same single-threaded-driver caveat
    as streaming._stream_partitions: a concurrent writer in the same
    session would see the scoped value)."""
    df = stage_or_df.df if isinstance(stage_or_df, Stage) else stage_or_df
    partition_by = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, prev)


def _hive_partition_cols(path: str, data_files: tp.List[str]) -> tp.List[str]:
    """Discover a Hive ``k=v`` directory layout from the data files' paths.

    Returns the ordered partition column names, or [] for a flat layout.
    Raises on an inconsistent layout (files at mixed depths / mismatched
    column names) — compacting such a directory would corrupt it."""
    layouts = set()
    for f in data_files:
        rel = os.path.relpath(f, path)
        dirs = [d for d in os.path.dirname(rel).split(os.sep) if d and d != "."]
        cols = tuple(d.split("=", 1)[0] for d in dirs if "=" in d)
        if len(cols) != len(dirs):
            # a non k=v subdirectory holding data files — not Hive layout;
            # refuse rather than silently flatten it
            raise ValueError(
                f"compact_parquet: non-partition subdirectory in {rel!r}; "
                "refusing to compact a directory whose layout it would destroy"
            )
        layouts.add(cols)
    if len(layouts) > 1:
        raise ValueError(
            f"compact_parquet: inconsistent partition layouts {sorted(layouts)} "
            f"under {path}"
        )
    return list(layouts.pop()) if layouts else []


def compact_parquet(
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    spark: tp.Optional[SparkSession] = None,
) -> dict:
    """Small-files maintenance: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` each. Streaming sinks and incremental
    appends accumulate many tiny files; at scan time every file costs a
    task plus footer/open overhead, so a directory of 10k small files can
    be 10-100× slower to read than the same bytes in right-sized files —
    compaction is the standing maintenance job every long-lived dataset
    runs.

    Hive-partitioned roots (``k=v`` subdirectories) are compacted
    layout-preserving: the rewrite re-emits the same partitionBy directory
    tree (partition values round-trip as verbatim strings — type inference
    is disabled for the compaction read so ``p=3`` comes back as ``p=3``,
    never retyped), so partition pruning and overwrite_partitions keep
    working on the compacted root. Each partition gets
    ceil(partition_bytes / target) output files via an in-partition salt,
    so one global shuffle sizes every partition's files independently —
    no driver loop over partitions, no one-giant-file-per-key skew.

    Safety: the rewritten tree is row-count-verified against the original
    BEFORE anything is deleted; on mismatch the original is untouched and
    the temp output is removed. The swap itself is two directory renames —
    not atomic (a table format does this transactionally); if the second
    rename fails the first is rolled back. Schedule compaction when no
    readers race it. Returns {files_before, files_after, bytes}."""
    import glob as _glob
    import shutil

    sp = _spark(spark)

    def _data_files(root: str) -> tp.List[str]:
        out = []
        for f in _glob.glob(os.path.join(root, "**", "*"), recursive=True):
            rel = os.path.relpath(f, root)
            segs = rel.split(os.sep)
            if os.path.isfile(f) and not any(
                s.startswith(("_", ".")) for s in segs
            ):
                out.append(f)
        return out

    parts = _data_files(path)
    part_cols = _hive_partition_cols(path, parts)
    total = sum(os.path.getsize(f) for f in parts)
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__precompact"
    shutil.rmtree(tmp, ignore_errors=True)

    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = sp.conf.get(infer_key, "true")
    sp.conf.set(infer_key, "false")
    try:
        src = sp.read.parquet(path)
        if not part_cols:
            n = max(1, -(-total // int(target_file_bytes)))
            src.repartition(int(n)).write.parquet(tmp)
        else:
            # per-leaf byte totals → files per partition, keyed on the
            # verbatim (unescaped) string partition values
            import functools
            from urllib.parse import unquote

            from pyspark.sql.types import LongType, StringType, StructField, StructType

            # Spark writes NULL partition values as this sentinel directory;
            # reading back yields NULL, so the nf keys must carry real nulls
            # (and the join below must be null-safe) or those rows vanish
            # from the rewrite and the row-count verify always aborts.
            HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

            leaf_bytes: tp.Dict[tuple, int] = {}
            for f in parts:
                rel = os.path.dirname(os.path.relpath(f, path))
                vals = tuple(
                    None if d.split("=", 1)[1] == HIVE_NULL
                    else unquote(d.split("=", 1)[1])
                    for d in rel.split(os.sep)
                )
                leaf_bytes[vals] = leaf_bytes.get(vals, 0) + os.path.getsize(f)
            counts = [
                vals + (max(1, -(-b // int(target_file_bytes))),)
                for vals, b in leaf_bytes.items()
            ]
            total_n = sum(c[-1] for c in counts)
            nf_schema = StructType(
                [StructField(c, StringType()) for c in part_cols]
                + [StructField("__nf", LongType())]
            )
            nf = sp.createDataFrame(counts, nf_schema).alias("__nf_side")
            s = src.alias("__src_side")
            cond = functools.reduce(
                lambda a, b: a & b,
                [s[c].eqNullSafe(nf[c]) for c in part_cols],
            )
            # Salt must be DETERMINISTIC per row: a hash of a
            # nondeterministic id (monotonically_increasing_id) can reroute
            # rows on shuffle-map task retry — the classic Spark
            # nondeterministic-repartition hazard — and the row-count verify
            # cannot catch an offsetting duplicate+loss pair. Hashing the
            # row's own columns replays identically on retry. Two fixups:
            # xxhash64 REJECTS MapType (anywhere in the type, incl. nested
            # in arrays/structs), so only hashable columns feed the hash;
            # and fully-identical rows would all share one salt — collapsing
            # a duplicate-heavy partition into one file regardless of __nf —
            # so input_file_name() (stable per row across retries: a row's
            # source file never changes) is mixed in to spread identical
            # rows that arrive from different input files. Rows identical
            # within ONE input file still share a salt; that residual skew
            # is accepted — there is no per-row key that is both
            # deterministic under retry and distinct within a file.
            hashable = [
                F.col(c) for c, t in src.dtypes if "map<" not in t
            ]
            salted = (
                s.join(F.broadcast(nf), cond)
                .select("__src_side.*", "__nf_side.__nf")
                .withColumn(
                    "__salt",
                    F.pmod(
                        F.xxhash64(*hashable, F.input_file_name()),
                        F.col("__nf"),
                    ),
                )
            )
            (
                salted.repartition(int(total_n), *part_cols, F.col("__salt"))
                .drop("__nf", "__salt")
                .write.partitionBy(*part_cols)
                .parquet(tmp)
            )
        # verify before anything is deleted: the original stays authoritative
        # until the rewrite is proven complete
        n_src = sp.read.parquet(path).count()
        n_tmp = sp.read.parquet(tmp).count()
        if n_src != n_tmp:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compact_parquet: rewrite of {path} produced {n_tmp} rows, "
                f"expected {n_src}; original left untouched"
            )
    finally:
        sp.conf.set(infer_key, prev_infer)

    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # roll the first rename back — dataset stays visible
        raise
    shutil.rmtree(old)
    after = _data_files(path)
    return {"files_before": len(parts), "files_after": len(after), "bytes": total}
