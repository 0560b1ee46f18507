#!/usr/bin/env python
"""Scale probe: run the core operators on synthetic data 1-2 orders of
magnitude beyond sf0.1 (10M-row fact table, 100k-document corpus) to
verify plans and throughput hold as data grows. Results are recorded in
docs/SCALE.md.

Usage: python scripts/scale_probe.py [rows_fact] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    nums = [a for a in args if a.isdigit()]
    only = [a for a in args if not a.isdigit()]
    rows_fact = int(nums[0]) if len(nums) > 0 else 10_000_000
    n_docs = int(nums[1]) if len(nums) > 1 else 100_000
    n_vecs = int(nums[2]) if len(nums) > 2 else 100_000

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from clickhouse_arrow_spark.operators import dedup
    from clickhouse_arrow_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    tmp = tempfile.mkdtemp(prefix="cas_scale_")

    # -- synthesize a 10M-row fact table (deterministic, 32 files) -------
    fact = (
        spark.range(0, rows_fact, 1, 32)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1_000_000).alias("custkey"),
            (F.col("id") % 25).cast("int").alias("dimkey"),
            (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("price"),
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        )
    )
    fact.write.mode("overwrite").parquet(f"{tmp}/fact")
    fact = spark.read.parquet(f"{tmp}/fact")

    dim = spark.range(0, 25).select(
        F.col("id").cast("int").alias("dimkey"),
        F.concat(F.lit("dim_"), F.col("id")).alias("dim_name"),
    )

    # -- synthesize a 100k-doc corpus with 1% exact dups -----------------
    words = F.array(*[F.lit(w) for w in "spark query engine data table scan join filter group sort merge window hash batch stream row column value fast slow".split()])
    docs = (
        spark.range(0, n_docs, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.element_at(
                        words,
                        (F.pmod(F.xxhash64(F.col("id") % (n_docs // 100 * 99), i), F.lit(20)) + 1).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{tmp}/docs")
    docs = spark.read.parquet(f"{tmp}/docs")

    timings: dict[str, float] = {}

    def bench(name, df_or_fn):
        if only and not any(s in name for s in only):
            return
        t0 = time.perf_counter()
        df = df_or_fn() if callable(df_or_fn) else df_or_fn
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)

    # warm
    fact.count()
    docs.count()

    bench(
        "agg_wide",
        fact.groupBy("dimkey").agg(
            F.sum("price"), F.avg("price"), F.count("*"), F.min("ts"), F.max("ts")
        ),
    )
    bench(
        "broadcast_join_agg",
        fact.join(F.broadcast(dim), "dimkey").groupBy("dim_name").agg(
            F.sum("price").alias("rev")
        ),
    )
    bench(
        "window_per_key",
        fact.where(F.col("custkey") < 10_000)
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("custkey").orderBy(F.col("ts").desc())),
        )
        .where(F.col("rn") <= 3),
    )
    bench("topk", fact.orderBy(F.col("price").desc(), "k").limit(100))
    bench("dedup_exact_100k_docs", dedup.dedup_exact(docs))
    bench(
        "minhash_lsh_100k_docs",
        dedup.minhash_candidate_pairs(docs, threshold=0.5),
    )

    from clickhouse_arrow_spark.operators import text as text_ops

    bench("doc_profile_100k_docs", text_ops.doc_profile(docs))
    bench("pii_scrub_100k_docs", text_ops.pii_scrub(docs))
    bench(
        "chunking_100k_docs",
        text_ops.chunk_documents(docs, chunk_tokens=16, overlap=4),
    )
    bench("train_split_100k_docs", text_ops.train_split(docs))
    # benchmark side = 1% of the corpus (eval suites are small); overlap
    # exists by construction (the dup tail reuses low-id docs' text)
    bench(
        "decontaminate_100k_docs",
        text_ops.decontaminate(
            docs,
            docs.where(F.col("doc_id") % 100 == 0).select(
                F.col("doc_id").alias("bench_id"), "text"
            ),
            n=8,
        ),
    )
    bench("repetition_100k_docs", text_ops.repetition_metrics(docs))
    bench("bigram_logprob_100k_docs", text_ops.bigram_logprob(docs))

    from clickhouse_arrow_spark.operators.sampling import stratified_sample

    bench(
        "stratified_sample_10m_rows",
        stratified_sample(
            fact.withColumn(
                "stratum", F.when(F.col("dimkey") < 5, "hot").otherwise("cold")
            ),
            rates={"hot": 0.5, "cold": 0.05},
            strata_col="stratum",
            key_col="k",
        ).groupBy("stratum").count(),
    )

    from clickhouse_arrow_spark.operators import stats, timeseries

    # hypothesis tests over the full 10M-row fact table: moment path is
    # one keyed agg; the rank path exercises the two-phase cumsum
    bench(
        "welch_ttest_10m_rows",
        stats.ttest(fact, "price", F.col("dimkey") < 12, "welch"),
    )
    bench(
        "mann_whitney_10m_rows",
        stats.mann_whitney_u(fact, "price", F.col("dimkey") < 12),
    )
    bench(
        "association_10m_rows",
        stats.association(fact, "dimkey", "custkey"),
    )
    bench("equi_histogram_10m_rows", stats.equi_histogram(fact, "price", 32))
    iv = fact.select(
        "custkey",
        F.col("k").cast("double").alias("s"),
        (F.col("k") + (F.pmod(F.col("k"), F.lit(7)) + 1) * 3).cast("double").alias("e"),
    )
    bench(
        "interval_union_10m_rows",
        timeseries.interval_length_sum(iv, ["custkey"], "s", "e"),
    )
    bench(
        "max_intersections_10m_rows",
        timeseries.max_intersections(iv, ["custkey"], "s", "e"),
    )
    bench(
        "fuzzy_edit_pairs_100k_docs",
        text_ops.fuzzy_edit_distance_pairs(
            docs.withColumn("lang", (F.col("doc_id") % 500).cast("string")),
            prefix_len=40,
            length_band=5,
            max_distance=10,
        ),
    )

    # -- round-4 statement/operator surfaces -----------------------------
    from clickhouse_arrow_spark.operators import joins, timeseries as ts_ops

    bench(
        "any_join_10m_probe_1m_build",
        joins.any_join(
            fact.select("k", "custkey"),
            fact.select(F.col("custkey").alias("custkey"), "price", "ts"),
            on="custkey",
            order_by="ts",
        ),
    )
    sparse = fact.where(F.pmod(F.col("k"), 7) == 0).groupBy(
        (F.col("k") % 1_000_000).alias("axis")
    ).agg(F.count("*").alias("n"))
    bench(
        "with_fill_1m_grid",
        ts_ops.with_fill(sparse, "axis", 0, 1_000_000, 1),
    )
    series = fact.select(
        (F.col("k") % 1000).alias("sk"),
        F.col("k").cast("double").alias("x"),
        F.col("price").alias("y"),
    )
    bench("lttb_10m_rows_1000_series", ts_ops.lttb(series, "x", "y", 100, ["sk"]))
    bench("sparkbar_10m_rows_1000_keys", ts_ops.sparkbar(series, ["sk"], "x", "y", 40))

    # -- sequence packing over the full fact-table id space --------------
    from clickhouse_arrow_spark.operators import packing

    tok = fact.select(
        F.col("k").alias("doc_id"),
        (F.pmod(F.xxhash64("k"), F.lit(900)) + 1).alias("tokens"),
    )
    bench("pack_concat_chunks_10m", packing.concat_chunks(tok, budget=2048))
    bench(
        "pack_first_fit_10m_4096buckets",
        packing.first_fit(tok, budget=2048, n_buckets=4096),
    )

    # -- DSIR selection + bloom decontamination over the doc corpus ------
    from clickhouse_arrow_spark.operators import bloom as bloom_ops
    from clickhouse_arrow_spark.operators import dsir as dsir_ops

    dsir_target = docs.filter(F.col("doc_id") % 50 == 0)  # 2% target
    bench(
        "dsir_select_docs",
        lambda: dsir_ops.dsir_resample(
            dsir_ops.dsir_score(
                docs,
                dsir_ops.dsir_fit(dsir_target, docs, n_buckets=10_000),
                n_buckets=10_000,
            ),
            k=1000,
            seed=7,
        ),
    )
    bench(
        "bloom_decon_docs",
        lambda: bloom_ops.bloom_flag(
            docs,
            bloom_ops.bloom_build(dsir_target, n=8, m_bits=1 << 22, k=4),
            n=8,
            m_bits=1 << 22,
            k=4,
        ),
    )

    # -- perceptual-hash image dedup over synthesized real PPMs ----------
    from clickhouse_arrow_spark.operators import multimodal as mm

    def dhash_pipeline():
        imgs = docs.select(
            "doc_id", (F.col("doc_id") % 5000).alias("img_key")
        )
        hashes = mm.image_dhash(
            mm.attach_ppm_payload(imgs, key_col="img_key")
        )
        return mm.dhash_neardup(hashes, max_hamming=0)

    bench("dhash_dedup_docs", dhash_pipeline)

    def dhash_survivors_pipeline():
        # the DEFAULT terminal at scale: no pair emission — radius 0
        # survivors come straight off the distinct-hash groupBy
        imgs = docs.select(
            "doc_id", (F.col("doc_id") % 5000).alias("img_key")
        )
        hashes = mm.image_dhash(
            mm.attach_ppm_payload(imgs, key_col="img_key")
        )
        return mm.dhash_survivors(hashes, max_hamming=0)

    bench("dhash_survivors_docs", dhash_survivors_pipeline)

    # -- per-source caps (one keyed window exchange each) ----------------
    from clickhouse_arrow_spark.operators import sampling as smp

    srcd = docs.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 200)).alias("source"),
        F.length("text").alias("n_chars"),
    )
    bench(
        "cap_per_group_docs",
        lambda: smp.cap_per_group(srcd, "source", 100, "n_chars"),
    )
    bench(
        "token_cap_per_group_docs",
        lambda: smp.token_cap_per_group(srcd, "source", 50_000, "n_chars"),
    )
    # deliberately skewed domain distribution (round-8 probe): ~70% of
    # docs land in ONE group, the rest Zipf-ish over 20 — where the
    # keyed window would first hurt if the cap didn't bound per-key work
    skewd = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, F.lit("megadomain"))
        .otherwise(
            F.concat(F.lit("tail"), F.col("doc_id") % 20)
        ).alias("source"),
        F.length("text").alias("n_chars"),
    )
    bench(
        "cap_per_group_docs_skewed",
        lambda: smp.cap_per_group(skewd, "source", 100, "n_chars"),
    )
    bench(
        "token_cap_per_group_docs_skewed",
        lambda: smp.token_cap_per_group(skewd, "source", 50_000, "n_chars"),
    )
    bench(
        "epoch_expand_docs",
        lambda: smp.epoch_expand(
            srcd, F.lit(1.0) + (F.col("doc_id") % 3) * 0.5, seed=7
        ),
    )

    bench(
        "unimax_docs",
        lambda: smp.unimax_select(
            srcd.withColumnRenamed("n_chars", "tokens"),
            "source", "tokens", budget=2_000_000, max_epochs=3.0,
        ),
    )

    from clickhouse_arrow_spark.operators import text as text_ops

    bench(
        "c4_line_filter_docs",
        lambda: text_ops.c4_line_filter(
            docs.select(
                "doc_id",
                F.concat(
                    F.substring("text", 1, 60), F.lit(".\n"),
                    F.substring("text", 61, 30), F.lit("\n"),
                    F.substring("text", 91, 60), F.lit("?"),
                ).alias("text"),
            )
        ),
    )

    def resize_pipeline():
        imgs = docs.select(
            "doc_id", (F.col("doc_id") % 5000).alias("img_key")
        )
        return mm.resize_images(
            mm.attach_ppm_payload(imgs, key_col="img_key"), 8, 8
        )

    bench("resize_images_docs", resize_pipeline)

    def synth_videos():
        import pandas as _pd

        def synth(batches):
            for pdf in batches:
                payloads = []
                for doc_id in pdf["doc_id"]:
                    seed = int(doc_id) % 2000  # 1:2000 duplication
                    # nonlinear mix: every (seed, frame) pair hashes to
                    # a DISTINCT dHash (linear gradients collapse to ~40
                    # hashes and the pair join degenerates quadratic)
                    frames = [
                        bytes(
                            (((seed * 131 + i) ^ (k * 2654435761))
                             * 0x9E3779B1 >> 16) % 256
                            for k in range(8 * 6 * 3)
                        )
                        for i in range(4)
                    ]
                    payloads.append(mm.encode_avi(frames, 8, 6))
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "video": payloads}
                )

        return docs.select("doc_id").mapInPandas(
            synth, "doc_id long, video binary"
        )

    bench(
        "video_neardup_docs",
        lambda: mm.video_neardup(synth_videos(), every_n=2, min_shared=2),
    )
    # survivor terminal: identical fingerprints collapse to one rep
    # BEFORE the candidate join — no quadratic pair term
    bench(
        "video_survivors_docs",
        lambda: mm.video_survivors(synth_videos(), every_n=2, min_shared=2),
    )

    def audio_pipeline():
        clips = docs.select("doc_id")
        return mm.audio_spectral_features(
            mm.attach_media_payloads(clips).select("doc_id", "wav")
        )

    bench("audio_spectral_docs", audio_pipeline)

    # -- streaming: stateful sessionization throughput at 1M events ------
    import shutil as _sh

    ev_dir = f"{tmp}/ev_stream"
    (
        spark.range(0, 1_000_000, 1, 8)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.col("id") % 10_000) * 120_000_000 + (F.col("id") % 7)
            ).alias("ts"),
            (F.col("id") % 10_000).alias("user_id"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{ev_dir}/events.parquet")
    )
    from clickhouse_arrow_spark.streaming.events import stateful_sessions

    schema = spark.read.parquet(f"{ev_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(f"{ev_dir}/events.parquet")
    )
    t0 = time.perf_counter()
    q = (
        stateful_sessions(stream, gap_minutes=30)
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ckpt_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    timings["streaming_stateful_sessions_1m_events"] = round(
        time.perf_counter() - t0, 2
    )
    _sh.rmtree(f"{tmp}/ckpt_sessions", ignore_errors=True)

    # -- semantic dedup (16-dim, 1% planted clones); nlist ~= sqrt(N) ----
    from clickhouse_arrow_spark.operators import similarity as sim_ops

    def mk_vecs(n):
        return spark.range(0, n, 1, 32).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id") % (n // 100 * 99), i),
                           F.lit(1000))
                    / 1000.0
                ),
            ).alias("embedding"),
        )

    vecs = mk_vecs(100_000)
    bench(
        "semantic_dedup_100k_vectors_nlist256",
        lambda: sim_ops.semantic_dedup(vecs, threshold=0.999, nlist=256),
    )
    bench(
        "semantic_decontaminate_100k_vectors",
        lambda: sim_ops.semantic_decontaminate(
            vecs, vecs.where(F.col("vec_id") < 1000), threshold=0.999
        ),
    )
    if n_vecs > 100_000:
        import math as _math

        nlist = 1 << round(_math.log2(max(_math.sqrt(n_vecs), 2)))
        big_vecs = mk_vecs(n_vecs)
        bench(
            f"semantic_dedup_{n_vecs // 1000}k_vectors_nlist{nlist}",
            lambda: sim_ops.semantic_dedup(
                big_vecs, threshold=0.999, nlist=nlist
            ),
        )

    # -- span-level (C4) dedup over the document corpus ------------------
    bench(
        f"span_dedup_{n_docs // 1000}k_docs",
        lambda: text_ops.span_dedup(docs),
    )

    # -- round-8: exact-substring dedup (Lee et al. ExactSubstr) — the
    # window explode is the amplification (~n_tokens rows/doc); must
    # scale ~linearly in corpus size, never quadratically in dup count
    bench(
        f"substring_dedup_{n_docs // 1000}k_docs",
        lambda: text_ops.substring_dedup(
            docs, min_tokens=20, keep_text=False
        ),
    )

    # -- round-6 pipeline ops: Gopher rules (pure codegen projection)
    # and epoch shuffle (the one op whose cost is a full
    # range-partitioned global sort — both md5 and xxhash64 keys)
    bench(
        f"gopher_filter_{n_docs // 1000}k_docs",
        lambda: text_ops.gopher_quality_filter(docs),
    )

    # -- round-6: token-budget selection (two-phase prefix sum over the
    # quality order) and incremental dedup (batch-vs-store band join)
    from clickhouse_arrow_spark.operators import dedup as dedup_ops
    from clickhouse_arrow_spark.operators.sampling import select_token_budget

    budget_docs = fact.select(
        F.col("k").alias("doc_id"),
        (F.pmod(F.xxhash64("k"), F.lit(1000)) / 1000.0).alias("quality"),
        (F.pmod(F.xxhash64("k", F.lit(1)), F.lit(900)) + 100).alias("tokens"),
    )
    bench(
        f"select_token_budget_{rows_fact // 1_000_000}m_rows",
        lambda: select_token_budget(budget_docs, budget=rows_fact * 100),
    )

    # -- round-6: projection routing at 10M rows — the read-side payoff
    # (partials re-aggregation vs full base scan) and the insert
    # trigger's O(block) maintenance cost
    if not only or any(s in "projection_routing" for s in only):
        from clickhouse_arrow_spark.client import Client
        from clickhouse_arrow_spark.ddl import CreateOptions, create_table

        client = Client(spark)
        spark.sql("CREATE DATABASE IF NOT EXISTS probedb")
        spark.sql("DROP TABLE IF EXISTS probedb.fact_p")
        spark.sql("DROP TABLE IF EXISTS probedb.fact_p__proj_by_dim")
        create_table(
            spark, "probedb", "fact_p",
            [("k", "Int64"), ("dimkey", "Int32"), ("price", "Float64")],
            CreateOptions(engine="MergeTree", order_by=("k",)),
        )
        client.insert("probedb.fact_p",
                      fact.select("k", "dimkey", "price"))
        client.execute_ch(
            "ALTER TABLE probedb.fact_p ADD PROJECTION by_dim "
            "(SELECT dimkey, sum(price) AS rev, count() AS n "
            "GROUP BY dimkey)"
        )
        t0 = time.perf_counter()
        client.execute_ch(
            "ALTER TABLE probedb.fact_p MATERIALIZE PROJECTION by_dim"
        )
        timings["projection_materialize_sec"] = round(
            time.perf_counter() - t0, 2
        )
        q = ("SELECT dimkey, sum(price) AS rev, count() AS n "
             "FROM probedb.fact_p GROUP BY dimkey")
        t0 = time.perf_counter()
        client.query_ch(q).write.format("noop").mode("overwrite").save()
        timings["projection_routed_query_sec"] = round(
            time.perf_counter() - t0, 2
        )
        t0 = time.perf_counter()
        spark.sql(
            "SELECT dimkey, sum(price) AS rev, count(*) AS n "
            "FROM probedb.fact_p GROUP BY dimkey"
        ).write.format("noop").mode("overwrite").save()
        timings["projection_base_scan_sec"] = round(
            time.perf_counter() - t0, 2
        )
        t0 = time.perf_counter()
        client.insert(
            "probedb.fact_p",
            spark.range(0, 10_000).select(
                (F.col("id") + rows_fact).alias("k"),
                (F.col("id") % 25).cast("int").alias("dimkey"),
                F.lit(1.0).alias("price"),
            ),
        )
        timings["projection_insert_10k_block_sec"] = round(
            time.perf_counter() - t0, 2
        )
        spark.sql("DROP TABLE IF EXISTS probedb.fact_p__proj_by_dim")
        spark.sql("DROP TABLE IF EXISTS probedb.fact_p")

    def _incremental():
        store = dedup_ops.minhash_store(docs.where(F.col("doc_id") % 10 != 0))
        batch = docs.where(F.col("doc_id") % 10 == 0)
        survivors, _rows = dedup_ops.dedup_incremental(
            batch, store, threshold=0.9
        )
        return survivors
    bench(f"dedup_incremental_{n_docs // 1000}k_docs", _incremental)
    bench(
        f"epoch_shuffle_md5_{n_docs // 1000}k_docs",
        lambda: text_ops.epoch_shuffle(docs, seed=7),
    )
    bench(
        f"epoch_shuffle_xxh_{n_docs // 1000}k_docs",
        lambda: text_ops.epoch_shuffle(docs, seed=7, fast=True),
    )

    # -- round-6: BM25 ranking (query-term filter before the (doc,term)
    # shuffle) and one-pass PCA (per-partition gram partials; the
    # reduce is d*d+d+1 scalars regardless of N)
    from clickhouse_arrow_spark.operators import projection as proj_ops
    from clickhouse_arrow_spark.operators import text_search as search_ops

    bench(
        f"bm25_topk_{n_docs // 1000}k_docs",
        lambda: search_ops.bm25_topk(docs, "spark window merge", k=100),
    )
    # quality classifier: distributed L-BFGS fit + shuffle-free scoring
    if not only or any(s in "quality_model_fit_score" for s in only):
        from clickhouse_arrow_spark.operators import quality_model as qm_ops

        labeled = docs.withColumn(
            "label", (F.col("doc_id") % 2).cast("int")
        )
        t0 = time.perf_counter()
        qmodel = qm_ops.train_quality_classifier(labeled, max_iter=20)
        timings[f"quality_fit_{n_docs // 1000}k_docs"] = round(
            time.perf_counter() - t0, 2
        )
        bench(
            f"quality_score_{n_docs // 1000}k_docs",
            lambda: qm_ops.score_quality(docs, qmodel),
        )

    # BPE: training cost is ONE word-count shuffle + a driver loop over
    # the bounded dictionary; encode is the full-corpus pandas-UDF pass
    if not only or any(s in "bpe_train_encode" for s in only):
        from clickhouse_arrow_spark.operators import bpe as bpe_ops

        t0 = time.perf_counter()
        bpe_model = bpe_ops.bpe_train(docs, num_merges=200)
        timings[f"bpe_train_{n_docs // 1000}k_docs"] = round(
            time.perf_counter() - t0, 2
        )
        bench(
            f"bpe_encode_{n_docs // 1000}k_docs",
            lambda: bpe_ops.bpe_encode(docs, bpe_model),
        )
    if not only or any(s in "pca_fit_project" for s in only):
        pca_vecs = mk_vecs(n_vecs)
        t0 = time.perf_counter()
        pca_model = proj_ops.pca_fit(pca_vecs, k=8)
        timings[f"pca_fit_{n_vecs // 1000}k_vectors"] = round(
            time.perf_counter() - t0, 2
        )
        bench(
            f"pca_project_{n_vecs // 1000}k_vectors",
            lambda: proj_ops.pca_project(pca_vecs, pca_model, whiten=True),
        )

    out = {
        "rows_fact": rows_fact,
        "n_docs": n_docs,
        "cores": spark.sparkContext.defaultParallelism,
        "timings_sec": timings,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
