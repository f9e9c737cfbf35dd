"""IO round-trips: every reader/writer pair preserves rows, and columnar
formats keep the pushdown story (the reference has no connectors at all —
SURVEY.md §2.2 — so this surface is pure Spark-native addition)."""

import os

import pytest
from pyspark.sql import functions as F

import pypeln_spark as pl


@pytest.fixture()
def small_df(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_and_pushdown(spark, small_df, tmp_path):
    p = str(tmp_path / "nation_orc")
    pl.write_orc(small_df, p)
    back = pl.read_orc(p, spark)
    assert _rows(back.df) == _rows(small_df)
    q = back.df.filter(F.col("n_nationkey") == 3).select("n_name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: []" not in plan  # the equality filter reached the scan


def test_jsonl_roundtrip_is_line_delimited(spark, small_df, tmp_path):
    import glob
    import json

    p = str(tmp_path / "nation_jsonl")
    pl.write_jsonl(small_df, p)
    # every part file is one JSON object per line (the jsonl contract)
    lines = []
    for f in glob.glob(f"{p}/part-*"):
        with open(f) as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == small_df.count()
    back = pl.read_json(p, spark)
    assert sorted(r["n_name"] for r in lines) == sorted(
        r.n_name for r in back.df.collect()
    )


def test_csv_roundtrip_with_header(spark, small_df, tmp_path):
    p = str(tmp_path / "nation_csv")
    pl.write_csv(small_df, p)
    back = pl.read_csv(p, spark, inferSchema=True)
    assert _rows(back.df.select("n_nationkey", "n_name", "n_regionkey")) == _rows(
        small_df
    )


def test_read_text_lines_and_wholetext(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("only line\n")
    lines = pl.read_text(str(d), spark)
    assert sorted(r.value for r in lines.df.collect()) == [
        "line one",
        "line two",
        "only line",
    ]
    whole = pl.read_text(str(d), spark, whole=True)
    vals = sorted(r.value for r in whole.df.collect())
    assert vals == ["line one\nline two\n", "only line\n"]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy layout must let Catalyst prune directories — the scan of
    one partition value reads only that directory."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "docs_by_lang")
    pl.write_parquet(docs, p, partition_by=["lang"])
    back = spark.read.parquet(p)
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    assert one.count() == docs.filter(F.col("lang") == "en").count()


def test_xml_roundtrip(spark, tmp_path):
    """XML read/write (Spark 4 built-in — no external package): values,
    types, and nested structs survive the roundtrip."""
    import pypeln_spark as pl
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, score double"
    ).withColumn("meta", F.struct(F.col("id").alias("orig"), F.lit("x").alias("tag")))
    path = str(tmp_path / "xml_rt")
    pl.write_xml(df, path, row_tag="doc")
    back = pl.read_xml(path, row_tag="doc").df
    got = sorted(
        (r.id, r.name, r.score, r.meta.orig, r.meta.tag) for r in back.collect()
    )
    assert got == [(1, "a", 1.5, 1, "x"), (2, "b", 2.5, 2, "x")]


def test_bucketed_table_roundtrip_and_colocated_agg(spark):
    """write_bucketed/read_table: values round-trip, the bucket spec lands
    in the catalog, and a groupBy on the bucket key aggregates WITHOUT an
    Exchange (the amortized-shuffle property)."""
    import pypeln_spark as pl
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_unit_test")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/bkt_unit_test", ignore_errors=True)
    pl.write_bucketed(df, "bkt_unit_test", "k", n_buckets=4, sort_cols="k")
    back = pl.read_table("bkt_unit_test", spark=spark)
    assert back.df.count() == 1000
    agg = back.df.groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # bucket layout satisfies the agg
    want = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert {r.k: r.s for r in agg.collect()} == want
    spark.sql("DROP TABLE IF EXISTS bkt_unit_test")


def test_overwrite_partitions_rewrites_only_touched(spark, tmp_path):
    """Dynamic partition overwrite: an update frame containing only
    partition p=2 replaces p=2 and leaves p=1/p=3 bytes untouched (the
    static default would wipe the whole root)."""
    import os

    import pypeln_spark as pl
    from pyspark.sql import functions as F

    root = str(tmp_path / "dpo")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "p int, v string"
    )
    base.write.partitionBy("p").parquet(root)

    def files_of(p):
        d = f"{root}/p={p}"
        return sorted(
            (f, os.path.getmtime(f"{d}/{f}"))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    before_p1, before_p3 = files_of(1), files_of(3)
    upd = spark.createDataFrame([(2, "B2"), (2, "B3")], "p int, v string")
    pl.overwrite_partitions(upd, root, "p")
    got = sorted((r.p, r.v) for r in spark.read.parquet(root).collect())
    assert got == [(1, "a"), (2, "B2"), (2, "B3"), (3, "c")]
    # untouched partitions keep the same files with the same mtimes
    assert files_of(1) == before_p1 and files_of(3) == before_p3
    # scoped conf restored after the write
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower() == "static"


def test_json_corrupt_record_handling(spark, tmp_path):
    """Malformed JSON lines land in the corrupt-record column under
    PERMISSIVE (the 100 TB ingest default: quarantine, don't die), and
    DROPMALFORMED silently drops them — both through the io layer."""
    import pypeln_spark as pl

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{"k": broken\n{"k": 3, "v": "c"}\n')
    schema = "k long, v string, _corrupt_record string"
    good = pl.read_json(
        str(p), spark=spark, schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).df
    rows = good.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "broken" in bad[0]._corrupt_record
    dropped = pl.read_json(
        str(p), spark=spark, schema="k long, v string", mode="DROPMALFORMED"
    ).df
    assert sorted(r.k for r in dropped.collect()) == [1, 3]


def test_parquet_schema_merge_across_files(spark, tmp_path):
    """mergeSchema reads files written with evolving schemas as one table
    (new column NULL for old files) — the additive-evolution contract a
    long-lived parquet dataset depends on."""
    root = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(root)
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    ).write.mode("append").parquet(root)
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    got = {r.k: (r.v, r.score) for r in merged.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction rewrites a many-tiny-files directory into ~target-size
    files with identical data; the input file count collapses."""
    import pypeln_spark as pl

    root = str(tmp_path / "tiny")
    df = spark.range(10_000).selectExpr("id AS k", "id * 2 AS v")
    df.repartition(64).write.parquet(root)  # 64 tiny files
    before = sorted(tuple(r) for r in spark.read.parquet(root).collect())
    stats = pl.compact_parquet(root, target_file_bytes=1 << 30, spark=spark)
    assert stats["files_before"] >= 64 and stats["files_after"] == 1
    after = sorted(tuple(r) for r in spark.read.parquet(root).collect())
    assert after == before
    assert not (tmp_path / "tiny__compacting").exists()
    assert not (tmp_path / "tiny__precompact").exists()


def test_compact_parquet_preserves_hive_partitions(spark, tmp_path):
    """ADVICE r4 (medium): compacting a Hive-partitioned root must keep the
    k=v directory layout (partition pruning + overwrite_partitions depend
    on it), re-emit verbatim partition values, and count files recursively
    on both sides."""
    import pypeln_spark as pl

    root = str(tmp_path / "parts")
    df = spark.range(6_000).selectExpr("id AS k", "id % 3 AS p", "id * 2 AS v")
    df.repartition(16).write.partitionBy("p").parquet(root)
    before = sorted(
        (r.k, int(r.p), r.v) for r in spark.read.parquet(root).collect()
    )
    stats = pl.compact_parquet(root, target_file_bytes=1 << 30, spark=spark)
    # layout preserved: the same p=0/1/2 dirs, one data file in each
    subdirs = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    assert subdirs == ["p=0", "p=1", "p=2"]
    assert stats["files_before"] >= 16
    assert 3 <= stats["files_after"] <= 6  # ~1 per partition, counted recursively
    again = spark.read.parquet(root)
    # partition column still prunes (still typed at read via inference)
    assert again.filter("p = 1").count() == 2_000
    after = sorted((r.k, int(r.p), r.v) for r in again.collect())
    assert after == before


def test_compact_parquet_refuses_non_hive_subdirs(spark, tmp_path):
    """A data-bearing subdirectory that is NOT k=v layout must raise — the
    old behavior silently flattened it."""
    import pypeln_spark as pl

    root = tmp_path / "nested"
    spark.range(10).write.parquet(str(root / "sub"))
    with pytest.raises(ValueError, match="non-partition subdirectory"):
        pl.compact_parquet(str(root), spark=spark)


def test_compact_parquet_multilevel_partitions(spark, tmp_path):
    """Two-level Hive layout (a=.../b=...): compaction preserves the full
    nested tree and every partition's rows."""
    root = str(tmp_path / "two_level")
    df = spark.range(4_000).selectExpr(
        "id AS k", "id % 2 AS a", "id % 3 AS b", "id * 7 AS v"
    )
    df.repartition(12).write.partitionBy("a", "b").parquet(root)
    before = sorted(
        (r.k, int(r.a), int(r.b), r.v) for r in spark.read.parquet(root).collect()
    )
    stats = pl.compact_parquet(root, target_file_bytes=1 << 30, spark=spark)
    assert stats["files_before"] > stats["files_after"] >= 6  # 2x3 leaves
    tree = sorted(
        os.path.relpath(os.path.join(d, s), root)
        for d in [os.path.join(root, x) for x in os.listdir(root) if x.startswith("a=")]
        for s in os.listdir(d) if s.startswith("b=")
    )
    assert tree == sorted(
        f"a={i}/b={j}" for i in range(2) for j in range(3)
    )
    after = sorted(
        (r.k, int(r.a), int(r.b), r.v) for r in spark.read.parquet(root).collect()
    )
    assert after == before
    assert spark.read.parquet(root).filter("a = 1 AND b = 2").count() == \
        sum(1 for r in before if r[1] == 1 and r[2] == 2)


def test_compact_parquet_null_partition_values(spark, tmp_path):
    """ADVICE r5 (low): a NULL partition value is written as the
    __HIVE_DEFAULT_PARTITION__ sentinel directory and read back as NULL;
    the per-partition file-count join must be null-safe or those rows
    vanish from the rewrite and the row-count verify aborts forever."""
    import pypeln_spark as pl

    root = str(tmp_path / "nullpart")
    df = spark.range(3_000).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id % 3 AS STRING) END AS p",
        "id * 2 AS v",
    )
    df.repartition(12).write.partitionBy("p").parquet(root)
    assert os.path.isdir(os.path.join(root, "p=__HIVE_DEFAULT_PARTITION__"))
    before = sorted((r.k, r.p, r.v) for r in spark.read.parquet(root).collect())
    stats = pl.compact_parquet(root, target_file_bytes=1 << 30, spark=spark)
    assert stats["files_before"] >= 12
    assert 3 <= stats["files_after"] <= 6
    # the null-partition directory survives the rewrite, rows intact
    assert os.path.isdir(os.path.join(root, "p=__HIVE_DEFAULT_PARTITION__"))
    again = spark.read.parquet(root)
    after = sorted((r.k, r.p, r.v) for r in again.collect())
    assert after == before
    assert again.filter("p IS NULL").count() == 1_000


def test_compact_parquet_map_column(spark, tmp_path):
    """ADVICE r6 (medium): xxhash64 rejects MapType, so the deterministic
    salt must hash only hashable columns — a Hive-partitioned dataset
    carrying a map column compacted fine before the r6 salt change and
    must keep doing so."""
    import pypeln_spark as pl

    root = str(tmp_path / "mapcol")
    df = spark.range(2_000).selectExpr(
        "id AS k", "id % 2 AS p", "map('a', id, 'b', id * 2) AS m"
    )
    df.repartition(8).write.partitionBy("p").parquet(root)
    before = sorted(
        (r.k, int(r.p), tuple(sorted(r.m.items())))
        for r in spark.read.parquet(root).collect()
    )
    stats = pl.compact_parquet(root, target_file_bytes=1 << 30, spark=spark)
    assert stats["files_before"] >= 8
    after = sorted(
        (r.k, int(r.p), tuple(sorted(r.m.items())))
        for r in spark.read.parquet(root).collect()
    )
    assert after == before


def test_compact_parquet_duplicate_rows_still_split(spark, tmp_path):
    """ADVICE r6 (medium): fully-identical rows all hash to the same salt;
    without a tiebreaker a duplicate-dominated partition collapses into
    ONE file no matter what __nf says. input_file_name() in the salt keeps
    identical rows from different input files apart, so the file-sizing
    split survives (identical rows within one input file still share a
    salt — the documented residual)."""
    import pypeln_spark as pl

    root = str(tmp_path / "dups")
    one = spark.sql("SELECT 'x' AS k, 1 AS v, 0 AS p")
    for _ in range(4):  # 4 separate input files of the SAME single row
        one.coalesce(1).write.mode("append").partitionBy("p").parquet(root)
    assert len(os.listdir(os.path.join(root, "p=0"))) >= 4
    stats = pl.compact_parquet(root, target_file_bytes=1, spark=spark)
    # target=1 byte → __nf > 1 for the p=0 leaf; the old all-column hash
    # gave every copy the same salt → 1 file; the file-name mix keeps the
    # split alive
    assert stats["files_after"] >= 2
    assert spark.read.parquet(root).count() == 4
