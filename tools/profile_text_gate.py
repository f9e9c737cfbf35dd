"""Per-phase wall profiler for the streaming TEXT ingest gate (r14).

Replicates queries/streaming._text_ingest_gate exactly — same harness,
same index, same epoch bodies — but the gate body is an inlined, timed
copy of ext/dedup.TextIngestGate.__call__, so each epoch's cost splits
into driver plan construction vs the two real actions (decisions.write,
absorb). Decisions are NOT checked here (the oracle does that); this is
a wall-clock instrument only (guide §1: measure first).

Usage: python tools/profile_text_gate.py [runs] [--durable|--capped] [--real]

--real drives the ACTUAL TextIngestGate body (whole-epoch timers only)
instead of the inlined r13-shape copy — the A/B arm for gate-body
changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = int(args[0]) if args and args[0].isdigit() else 2
    durable = "--durable" in args
    capped = "--capped" in args
    real = "--real" in args

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pypeln_spark.session import get_spark
    from pypeln_spark.ext import dedup as D
    from pypeln_spark.ext import similarity as S
    from pypeln_spark import streaming as ST
    from pypeln_spark.queries.base import load_table
    from pypeln_spark.queries.dedup import BANDS, JACCARD_THRESHOLD, N_HASHES
    from pypeln_spark.queries.streaming import _compact_epochs

    spark = get_spark(app_name="profile_text_gate")
    spark.range(1000).selectExpr("sum(id)").collect()
    rpb = N_HASHES // BANDS

    for r in range(runs):
        t_run = time.perf_counter()
        phases: list[tuple[str, float]] = []

        def timed(label, fn):
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            out = fn()
            phases.append((label, time.perf_counter() - t0))
            spark.sparkContext.setJobDescription(None)
            return out

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        epochs = [docs.filter(F.col("doc_id") % 6 == c) for c in (1, 3, 5)]

        cor_sh = timed("cor_sh(cached)", lambda: S.cached_index(
            ("lsh_corpus_shingles", SF),
            lambda: D.shingle_arrays(D.spread(corpus), "text", "doc_id", 5),
        ))
        cor_bands = timed("cor_bands(cached)", lambda: S.cached_index(
            ("lsh_corpus_bands", SF, N_HASHES, BANDS),
            lambda: D.lsh_band_table(
                D.minhash_signatures_wide(cor_sh, "doc_id", N_HASHES),
                "doc_id", BANDS, rpb,
            ),
        ))

        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="ptg_ckpt_") if durable else None
        root = ST.stream_sink_dir("ptg_incrdedup_")
        out_schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("epoch", T.IntegerType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ])
        timed("seed_sink", lambda: ST.seed_sink_schema(spark, out_schema, root))

        index = D.IncrementalLshIndex(
            cor_sh, cor_bands,
            compact_every=1 if capped else _compact_epochs(),
            checkpoint_dir=ckpt,
            bucket_cap=2 if capped else None,
        )
        gate = D.TextIngestGate(
            index, root, N_HASHES, BANDS, 5, JACCARD_THRESHOLD,
            epoch_col=lambda: F.expr("CAST(((doc_id % 6) - 1) DIV 2 AS INT)"),
        )

        if real:
            def body(batch_df, epoch_id):
                timed(f"e{int(epoch_id)}.gate", lambda: gate(batch_df, epoch_id))

            timed("harness_total",
                  lambda: ST.staged_foreach_batch(spark, epochs, body))
            D.retire_pipeline_caches()
            index.close()
            timed("readback", lambda: spark.read.parquet(root)
                  .localCheckpoint(eager=True))
            ST.remove_sink_dir(spark, root)
            if ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)
            wall = time.perf_counter() - t_run
            print(f"run {r}: wall {wall:.3f}s")
            for name, dt in phases:
                print(f"    {name}: {dt:.3f}s")
            sys.stdout.flush()
            continue

        # inlined, timed copy of the r13-shape TextIngestGate.__call__
        # (the BEFORE arm — measurement only, decisions unchecked)
        def body(batch_df, epoch_id):
            ep = int(epoch_id)
            D.retire_pipeline_caches()
            t0 = time.perf_counter()
            new_sh = D.pool_persist(D.shingle_arrays(
                D.spread(batch_df), gate.text_col, gate.id_col, gate.shingle_k))
            new_bands = D.lsh_band_table(
                D.minhash_signatures_wide(new_sh, gate.id_col, gate.n_hashes),
                gate.id_col, gate.bands, gate.n_hashes // gate.bands,
            )
            nb = new_bands.select(
                F.col(gate.id_col).alias("new_id"), "sigh",
                F.col("sig").alias("sig_n"))
            cb = index.bands.select(
                F.col(gate.id_col).alias("corpus_id"), "sigh",
                F.col("sig").alias("sig_c"))
            cand = (nb.join(cb, "sigh")
                    .filter(F.col("sig_n") == F.col("sig_c"))
                    .select("new_id", "corpus_id").distinct())
            cand = cand.repartition(
                ST.shuffle_width(batch_df.sparkSession), F.col("new_id"))
            a = new_sh.select(
                F.col(gate.id_col).alias("new_id"), F.col("sh_arr").alias("sh_a"))
            b = index.sh.select(
                F.col(gate.id_col).alias("corpus_id"), F.col("sh_arr").alias("sh_b"))
            n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
            matches = (
                cand.join(a.hint("shuffle_hash"), "new_id")
                .join(b.hint("shuffle_hash"), "corpus_id")
                .withColumn("n_inter", n_inter)
                .withColumn("jaccard", F.col("n_inter").cast("double") / (
                    F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - F.col("n_inter")
                ).cast("double"))
                .filter(F.col("jaccard") >= gate.threshold))
            pick = D.pool_persist(matches.groupBy("new_id").agg(
                F.min(F.struct("corpus_id", "jaccard")).alias("m")))
            epoch = F.expr("CAST(((doc_id % 6) - 1) DIV 2 AS INT)")
            dropped = pick.select(F.col("new_id").alias(gate.id_col))
            novel_sh = new_sh.join(dropped, gate.id_col, "left_anti")
            decisions = (
                batch_df.select(gate.id_col)
                .join(pick, F.col(gate.id_col) == F.col("new_id"), "left")
                .select(gate.id_col, epoch.alias("epoch"),
                        F.col("m.corpus_id").alias("dup_of"),
                        F.col("m.jaccard").alias("jaccard")))
            if not gate._sink_checked:
                D.validate_sink_schema(decisions, gate.sink_root)
                gate._sink_checked = True
            phases.append((f"e{ep}.plan", time.perf_counter() - t0))
            timed(f"e{ep}.decisions_write",
                  lambda: decisions.write.mode("append").parquet(gate.sink_root))
            t1 = time.perf_counter()
            novel_bands = D.lsh_band_table(
                D.minhash_signatures_wide(novel_sh, gate.id_col, gate.n_hashes),
                gate.id_col, gate.bands, gate.n_hashes // gate.bands,
            )
            phases.append((f"e{ep}.novel_plan", time.perf_counter() - t1))
            timed(f"e{ep}.absorb", lambda: index.absorb(novel_sh, novel_bands))
            gate._epoch += 1

        timed("harness_total", lambda: ST.staged_foreach_batch(spark, epochs, body))
        D.retire_pipeline_caches()
        index.close()
        timed("readback", lambda: spark.read.parquet(root)
              .localCheckpoint(eager=True))
        ST.remove_sink_dir(spark, root)
        if ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)

        wall = time.perf_counter() - t_run
        body_s = sum(dt for name, dt in phases if name.startswith("e"))
        harness = next(dt for name, dt in phases if name == "harness_total")
        print(f"run {r}: wall {wall:.3f}s  harness-minus-body "
              f"{harness - body_s:.3f}s")
        for name, dt in phases:
            print(f"    {name}: {dt:.3f}s")
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
