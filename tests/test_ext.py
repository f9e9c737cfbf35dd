"""Extension-layer unit tests: multimodal plumbing (the only ext module
without an oracle-checked query) + spot checks on dedup/similarity internals."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pypeln_spark.ext import multimodal as M


def test_multimodal_extract_features_shapes(spark):
    assets = M.synthesize_assets(spark, n=32)
    out = M.extract_features(assets, fake_decode=True).collect()
    assert len(out) == 32
    for r in out:
        assert len(r.features) == 16
        assert r.mean_intensity == pytest.approx(float(np.mean(r.features)))
        assert r.batch_rows >= 1


def test_multimodal_real_decode_raises(spark):
    assets = M.synthesize_assets(spark, n=2)
    with pytest.raises(Exception) as ei:
        M.extract_features(assets, fake_decode=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_multimodal_frame_sample(spark):
    assets = M.synthesize_assets(spark, n=12)
    frames = M.frame_sample(assets, every_n=2)
    rows = frames.collect()
    assert all(r.frame_idx % 2 == 0 for r in rows)
    # every video asset with n_frames >= 1 contributes frame 0
    videos = assets.filter(F.col("modality") == "video").count()
    assert len({r.asset_id for r in rows}) == videos


def test_multimodal_resize_rewrites_meta_only(spark):
    assets = M.synthesize_assets(spark, n=3)
    out = M.resize_stub(assets, 128, 96).collect()
    for r in out:
        assert r.meta.width == 128 and r.meta.height == 96
        assert len(r.media) > 0


def test_metadata_query_prunes_media_column(spark):
    """Metadata-only aggregates must not read the media bytes — verify the
    optimized plan prunes the binary column (the 100 TB survival property)."""
    import tempfile

    assets = M.synthesize_assets(spark, n=16)
    with tempfile.TemporaryDirectory() as d:
        assets.write.mode("overwrite").parquet(f"{d}/assets")
        df = spark.read.parquet(f"{d}/assets")
        q = df.groupBy("modality").agg(F.avg(F.col("meta.n_frames")).alias("avg_frames"))
        # the scan's ReadSchema is what actually hits disk
        plan = q._jdf.queryExecution().executedPlan().toString()
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema and all("media" not in l for l in read_schema), (
            f"media column not pruned from scan:\n{plan}"
        )
        q.collect()


def test_simhash_pigeonhole_equals_bruteforce(spark, sf_dir):
    """The 4-byte band join must find exactly the pairs a full O(n^2) scan
    finds (hamming <= 3)."""
    from pypeln_spark.ext import dedup as D
    from pypeln_spark.queries.base import load_table

    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash_fingerprints(docs).cache()
    banded = {(r.id_a, r.id_b) for r in D.simhash_near_pairs(fp).collect()}
    a = fp.selectExpr("doc_id id_a", "simhash sh_a")
    b = fp.selectExpr("doc_id id_b", "simhash sh_b")
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("h", F.bit_count(F.expr("sh_a ^ sh_b")))
        .filter(F.col("h") <= 3)
    )
    assert banded == {(r.id_a, r.id_b) for r in brute.collect()}
    fp.unpersist()
