"""Scale-sanity probe: run the heaviest operators on synthetically
inflated data (NX the sf0.1 tables, disjoint ids per copy) and report how
wall-clock grows. Near-linear growth = the shuffle/partition strategy
holds; super-linear growth = a candidate-set or fan-out blow-up that would
sink a 100 TB run.

Usage: python tools/scale_probe.py [factor=10] [sf_dir=/root/testdata/sf0.1]
Prints one JSON line per probe: {probe, rows_base, rows_big, sec_base,
sec_big, growth} where growth = sec_big / (sec_base * factor) (1.0 =
perfectly linear).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def inflate(df, factor: int, id_cols: list[str], text_col: str | None = None):
    """factor disjoint copies: id columns offset per copy; when text_col is
    given, a copy marker token is woven between every pair of tokens so
    cross-copy shingle sets are disjoint (otherwise every copy is an exact
    duplicate and the probe measures the dup-blow-up worst case instead of
    clean scaling)."""
    copies = df.sparkSession.range(factor).select(F.col("id").alias("__copy"))
    out = df.crossJoin(F.broadcast(copies))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("__copy") * 10_000_000)
    if text_col:
        # suffix every token with the copy number: shingle LENGTH and
        # structure stay identical, cross-copy shingle sets are disjoint
        suffix = F.concat(F.lit("$1_"), F.col("__copy").cast("string"))
        out = out.withColumn(
            text_col, F.regexp_replace(F.col(text_col), F.lit(r"(\S+)"), suffix)
        )
    return out.drop("__copy")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dedup import exact_dedup
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        stratified_sample_exact,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.text import (
        lang_id,
        quality_score,
        token_count,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.packing import (
        pack_next_fit,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.rangejoin import (
        interval_join,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.ranking import (
        global_running_sums,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        bloom_might_contain,
        build_bloom,
        hll_sketch_table,
        mg_build,
    )

    def _bloom_count(d):
        ev = (
            d.filter(F.col("doc_id") % 1000 == 0)
            .select(F.explode(F.split("text", " ")).alias("s"))
            .distinct()
        )
        bloom = build_bloom(ev, "s", fpp=0.01)
        return (
            d.select(F.explode(F.split("text", " ")).alias("s"))
            .filter(bloom_might_contain(bloom, F.col("s")))
            .count()
        )

    def _segment_dup_count(d):
        toks = F.split("text", " ")
        w = d.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(toks) - 1, F.lit(0)),
                    F.lit(16),
                )
            ).alias("start"),
        )
        seg = F.md5(F.concat_ws(" ", F.slice("toks", F.col("start") + 1, 16)))
        segs = w.select(seg.alias("seg"))
        return (
            segs.groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.bpe import (
        bpe_token_counts,
        train_bpe,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        substring_dup_pairs,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.text import strip_html
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.scoring import (
        bigram_nll,
        fixture_weights,
        hashed_linear_score,
    )

    _QM_W, _QM_B = fixture_weights(64)

    _BPE_MERGES = train_bpe(
        [
            "the quick table scan joins the slow hash batch",
            "window order by value part key merge sort stream",
            "spark data column filter query small big line fast row agg customer",
        ],
        24,
    )

    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import (
        broadcast_if_small,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.session import get_spark
    from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table

    def _interval_pairs(e):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.rangejoin import (
            interval_join,
        )

        a = e.select(
            F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
        )
        b = e.select(
            F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
        )
        return (
            interval_join(a, b, "a_ts", "b_ts", 0, 300)
            .filter(F.col("a_id") < F.col("b_id"))
            .count()
        )

    def _curation_count(d):
        keep = exact_dedup(d).select("id", "keep")
        return (
            d.select(
                "doc_id",
                lang_id("text").alias("lang_pred"),
                token_count("text").alias("n_tok"),
                quality_score("text").alias("quality"),
            )
            .join(keep, F.col("doc_id") == F.col("id"))
            .filter(
                (F.col("keep") == 1)
                & (F.col("quality") >= 0.5)
                & F.col("n_tok").between(5, 10000)
            )
            .count()
        )

    def _tfidf_topk_count(d):
        # q58's shape: map-combined tf, distinct-explode df (broadcast),
        # rank window — the plan whose zipf behavior the skew probe pins
        from pyspark.sql.window import Window

        toks = F.split("text", " ")
        n_docs = float(d.count())
        tf = (
            d.select("doc_id", F.explode(toks).alias("word"))
            .groupBy("doc_id", "word")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dfreq = (
            d.select(F.explode(F.array_distinct(toks)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        sc = tf.join(F.broadcast(dfreq), "word").select(
            "doc_id", "word",
            F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("score"),
        )
        rk = F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
        )
        return sc.withColumn("rk", rk).filter(F.col("rk") <= 3).count()

    spark = get_spark()
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    events = table(spark, sf_dir, "events")
    docs_big = inflate(docs, factor, ["doc_id"], text_col="text").persist()
    events_big = inflate(events, factor, ["event_id"]).persist()
    # Zipf-skewed corpus for the TF-IDF probe: every doc gains a stopword
    # burst (16/8/4 occurrences of three corpus-wide words), so one word's
    # df == n_docs and its tf rows appear in EVERY doc — the reducer-side
    # worst case the map-side-combined df branch must absorb.
    docs_zipf_big = docs_big.withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" zq0" * 16 + " zq1" * 8 + " zq2" * 4)),
    ).persist()
    # Time-shifted copies for the range-join probe: each copy lives in its
    # own 31-day window, so the true pair count grows linearly with factor
    # and the probe measures the PLAN's scaling, not the quadratic pair
    # blow-up that denser-same-window data implies semantically.
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    events_ts_big = (
        events.crossJoin(F.broadcast(copies))
        .withColumn("event_id", F.col("event_id") + F.col("__copy") * 10_000_000)
        .withColumn(
            "ts", F.expr("ts + make_interval(0, 0, 0, __copy * 31, 0, 0, 0)")
        )
        .drop("__copy")
        .persist()
    )
    # warm pool + materialize inflated inputs off the clock
    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 4, 1, par).mapInPandas(lambda it: it, "id long").count()
    nb_docs, nb_events = docs_big.count(), events_big.count()

    def _funnel_count(e):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.relational import (
            funnel_times,
        )

        us = F.expr(
            "timestampdiff(MICROSECOND,"
            " timestamp_ntz'2024-01-01 00:00:00', ts)"
        )
        return funnel_times(
            e, "user_id", us, "event_type", ["view", "click", "purchase"]
        ).count()

    def _matvec_count(e):
        # synthetic user->item bipartite edges; ONE damped power-iteration
        # round (deg + rank join + groupBy dst) — the q142 shape
        edges = e.select(
            (F.col("user_id") * 2).alias("src"),
            (F.pmod(F.col("event_id"), F.lit(5000)) * 2 + 1).alias("dst"),
        ).distinct()
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        p = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
        return (
            edges.join(F.broadcast(p), edges.src == p.node)
            .join(F.broadcast(deg), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("pr"))
            .count()
        )

    def _exact_p90(e):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.quantiles import (
            exact_quantiles_via_summary,
        )

        return exact_quantiles_via_summary(e, "value", [0.9], eps=0.01)[0.9]

    def _kcore_sum(d):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
            core_numbers,
        )

        # deterministic hub graph INSIDE each copy's id block (hubs at
        # block + id%97, a second layer at block + id*31%9973): degree
        # varies hub-vs-leaf so coreness is non-degenerate, and copies
        # stay disjoint under the probe's +10M id offsets
        ids = d.select(F.col("doc_id").alias("i"))
        block = F.col("i") - F.pmod(F.col("i"), F.lit(10_000_000))
        e1 = ids.select(
            F.col("i").alias("u"),
            (block + F.pmod(F.col("i"), F.lit(97))).alias("v"),
        )
        e2 = ids.select(
            F.col("i").alias("u"),
            (block + F.pmod(F.col("i") * 31, F.lit(9973))).alias("v"),
        )
        edges = e1.unionAll(e2).where(F.col("u") != F.col("v"))
        return core_numbers(edges).agg(
            F.sum("coreness")
        ).first()[0]

    def _auc_reduce(e):
        # jitter by event_id so EVERY value is distinct — the grouped
        # table degenerates to corpus size, the worst case for the
        # running-total step (and the reason q165 uses the prefix sum)
        v = (F.col("value") + F.col("event_id").cast("double") * 1e-9).alias(
            "v"
        )
        y = (F.col("event_type") == "purchase").cast("long").alias("y")
        g = (
            e.select(v, y)
            .groupBy("v")
            .agg(
                F.sum("y").alias("p"),
                (F.count(F.lit(1)) - F.sum("y")).alias("q"),
            )
            .withColumn("t", F.col("p") + F.col("q"))
        )
        r = global_running_sums(g, [F.col("v")], F.col("t"), sum_col="cum")
        return r.agg(
            F.sum(
                F.col("p")
                * (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1)
            ).alias("s2")
        ).collect()[0]["s2"]

    probes = {
        "ngram_jaccard": (
            lambda d: ngram_jaccard_pairs(d, k=5, threshold=0.8).count(),
            docs,
            docs_big,
        ),
        "minhash_lsh": (
            lambda d: minhash_lsh_pairs(d, k=5, num_hashes=64, bands=16).count(),
            docs,
            docs_big,
        ),
        "simhash": (lambda d: simhash_near_pairs(d).count(), docs, docs_big),
        "window_topk": (
            lambda e: e.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window
                    .partitionBy("user_id")
                    .orderBy(F.col("value").desc(), "event_id")
                ),
            )
            .filter(F.col("rn") <= 5)
            .count(),
            events,
            events_big,
        ),
        "hash_agg": (
            lambda e: e.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)), F.sum("value"))
            .count(),
            events,
            events_big,
        ),
        "curation_pass": (  # q67 shape: text exprs + digest-window dedup
            lambda d: _curation_count(d),
            docs,
            docs_big,
        ),
        "stratified_sample": (  # one window shuffle on the strata key
            lambda d: stratified_sample_exact(
                d.withColumn("lang", F.substring("text", 1, 1)),
                ["lang"], 0.1, id_col="doc_id",
            ).count(),
            docs,
            docs_big,
        ),
        "interval_join": (  # binned range join: bucket equi-join, no NLJ
            lambda e: _interval_pairs(e),
            events,
            events_ts_big,
        ),
        "seq_packing": (  # sharded next-fit: parallel across shards
            lambda d: pack_next_fit(
                d.select("doc_id", token_count("text").alias("tok")),
                "doc_id", "tok", capacity=256, num_shards=64,
            ).count(),
            docs,
            docs_big,
        ),
        "bloom_probe": (  # map-only probe: k getbit tests per row
            lambda d: _bloom_count(d),
            docs,
            docs_big,
        ),
        "segment_dedup": (  # one shuffle on the 16-token segment hash
            lambda d: _segment_dup_count(d),
            docs,
            docs_big,
        ),
        "hll_sketch": (  # sketch-table build: map-side partials
            lambda e: hll_sketch_table(
                e.select((F.col("event_id") % 97).alias("g"), "user_id"),
                ["g"], "user_id", lgk=14,
            ).count(),
            events,
            events_big,
        ),
        "tfidf_zipf": (  # q58 under stopword skew: df(word)==n_docs hot keys
            lambda d: _tfidf_topk_count(d),
            docs,
            docs_zipf_big,
        ),
        "substring_dedup": (  # winnow fp index join; disjoint cross-copy
            lambda d: substring_dup_pairs(d, min_tokens=24, k=8).count(),
            docs,
            docs_big,
        ),
        "html_strip": (  # map-only regexp chain
            lambda d: d.select(
                F.sum(F.length(strip_html(F.col("text")))).alias("n")
            ).collect()[0][0],
            docs,
            docs_big,
        ),
        "bpe_encode": (  # encode-once-per-distinct-word: vocab grows
            # with the copy-suffixed corpus, per-doc counts join back
            lambda d: bpe_token_counts(d, _BPE_MERGES)
            .agg(F.sum("n_bpe"))
            .collect()[0][0],
            docs,
            docs_big,
        ),
        "bigram_nll": (  # vocab-bounded LM join: counts table grows with
            # the copy-suffixed vocab, corpus side joins once
            lambda d: bigram_nll(d)
            .agg(F.sum("n_bigrams"))
            .collect()[0][0],
            docs,
            docs_big,
        ),
        "quality_model": (  # map-only hashed linear scorer
            lambda d: d.select(
                F.sum(hashed_linear_score(F.col("text"), _QM_W, _QM_B))
            ).collect()[0][0],
            docs,
            docs_big,
        ),
        "funnel_fold": (  # one user_id shuffle + JVM state-machine fold
            lambda e: _funnel_count(e),
            events,
            events_big,
        ),
        "pagerank_matvec": (  # join-agg sparse matvec, one iteration
            lambda e: _matvec_count(e),
            events,
            events_big,
        ),
        "exact_quantile": (  # summary prune + bounded TakeOrdered refine
            lambda e: _exact_p90(e),
            events,
            events_big,
        ),
        "global_prefix_sum": (  # one range exchange + Arrow cumsum +
            # P-row driver offsets (ranking.py); project-first contract
            lambda d: global_running_sums(
                d.select("doc_id", F.length("text").alias("sz")),
                [F.col("sz").desc(), F.col("doc_id")],
                F.col("sz"),
            )
            .where(F.col("run_total") % 977 == 0)
            .count(),
            docs,
            docs_big,
        ),
        "kcore_hindex": (  # q178 shape: h-index fixpoint rounds (join +
            # degree-bounded window + agg per round). Inflation keeps
            # per-copy subgraphs disjoint (id offsets), so the fixpoint
            # round count stays flat while edges grow 10x — wall should
            # track edge volume, not rounds x volume.
            lambda d: _kcore_sum(d),
            docs,
            docs_big,
        ),
        "auc_midrank": (  # q165 shape: grouped value counts -> the
            # distributed prefix sum -> one-row midrank reduce. The
            # hostile property inflation creates: CONTINUOUS scores, so
            # distinct-value cardinality grows WITH the corpus (the case
            # that rules out a single-partition window); copies get value
            # offsets so the grouped table really is factor x larger.
            lambda e: _auc_reduce(e),
            events,
            events_big,
        ),
        "mg_heavy_hitters": (  # map-only Arrow counting pass; driver
            # holds n_batches * k counters (copy-suffixed vocab grows
            # with the corpus — the hostile case for any counter map)
            lambda d: len(
                mg_build(
                    d.select(
                        F.explode(F.split("text", " ")).alias("tok")
                    ).where(F.col("tok") != ""),
                    "tok",
                    k=256,
                )["counters"]
            ),
            docs,
            docs_big,
        ),
    }
    for name, (fn, base, big) in probes.items():
        fn(base)  # warm
        t0 = time.perf_counter()
        fn(base)
        t_base = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(big)
        t_big = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "probe": name,
                    "factor": factor,
                    "sec_base": round(t_base, 2),
                    "sec_big": round(t_big, 2),
                    "growth_vs_linear": round(t_big / (t_base * factor), 2),
                }
            )
        )

    # q55 hot-bucket skew probe: replicate ONE 5-minute window to
    # `factor`x density on the probe (b) side only. The a side of the
    # hot bucket is unchanged, so TRUE pairs grow ~linearly with the
    # replication — wall-clock tracking the pair-count ratio means the
    # binned join absorbs bucket skew (AQE skew split shards the hot
    # bucket's reducer); wall growing much faster than pairs would flag
    # a reducer hot spot no scale-up could hide.
    def _pairs2(ae, be):
        a = ae.select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
        b = be.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
        return (
            interval_join(a, b, "a_ts", "b_ts", 0, 300, drop_ts=True)
            .filter(F.col("a_id") < F.col("b_id"))
            .count()
        )

    mn = (
        events.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .agg(F.min("us"))
        .collect()[0][0]
    )
    # hot REGION = the corpus's first hour (12 consecutive 5-min buckets)
    # so the probe has signal even at small SF
    hot_src = events.filter(
        F.unix_micros(F.col("ts").cast("timestamp")) < mn + 3_600_000_000
    )
    b_hot = events_ts_big.unionByName(
        inflate(hot_src, factor, ["event_id"]).withColumn(
            "event_id", F.col("event_id") + F.lit(1_000_000_000)
        )
    ).persist()
    # warm BOTH paths (the hot side's union must materialize its cache
    # off the clock, same as the even side's persisted input)
    _pairs2(events_ts_big, events_ts_big)
    _pairs2(events_ts_big, b_hot)
    t0 = time.perf_counter()
    n_even = _pairs2(events_ts_big, events_ts_big)
    t_even = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_hot = _pairs2(events_ts_big, b_hot)
    t_hot = time.perf_counter() - t0
    pair_ratio = n_hot / max(n_even, 1)
    wall_ratio = t_hot / max(t_even, 1e-9)
    print(
        json.dumps(
            {
                "probe": "interval_hot_bucket",
                "factor": factor,
                "pairs_even": n_even,
                "pairs_hot": n_hot,
                "sec_even": round(t_even, 2),
                "sec_hot": round(t_hot, 2),
                "skew_overhead_vs_pairs": round(wall_ratio / pair_ratio, 2),
            }
        )
    )


    # Hot-boilerplate probe: EVERY doc shares a 30-token license-header
    # passage (the adversarial case for substring dedup — uncapped, the
    # shared fingerprints pair all docs quadratically). With fp_cap the
    # hot fingerprints drop and the work tracks the natural-dup volume:
    # wall must grow ~linearly despite the corpus-wide passage.
    boiler = " ".join(f"bz{i}" for i in range(30)) + " "
    docs_hot = docs.withColumn("text", F.concat(F.lit(boiler), F.col("text")))
    docs_hot_big = docs_big.withColumn(
        "text", F.concat(F.lit(boiler), F.col("text"))
    ).persist()
    docs_hot_big.count()

    def _sub_capped(d):
        return substring_dup_pairs(d, min_tokens=24, k=8, fp_cap=64).count()

    _sub_capped(docs_hot)  # warm
    t0 = time.perf_counter()
    n_base = _sub_capped(docs_hot)
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_big = _sub_capped(docs_hot_big)
    t_big = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "substring_hot_boilerplate",
                "factor": factor,
                "pairs_base": n_base,
                "pairs_big": n_big,
                "sec_base": round(t_base, 2),
                "sec_big": round(t_big, 2),
                "growth_vs_linear": round(t_big / (t_base * factor), 2),
            }
        )
    )

    # SemDeDup probe: clean scaling REQUIRES n_centroids ~ corpus size
    # (the documented law — cell population constant, within-cell join
    # linear overall). Cross-copy vectors are dimension-ROTATED so copies
    # are mutually near-orthogonal (identical copies would measure the
    # all-dup worst case, factor^2 output rows, not the plan).
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.similarity import (
        semantic_dup_pairs,
    )

    emb = table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    emb_big = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.element_at(
                    F.col("embedding"),
                    (F.pmod(i + F.col("__copy"), F.lit(dim)) + 1).cast("int"),
                ),
            ).alias("embedding"),
        )
        .persist()
    )
    emb_big.count()

    def _sem(e, cells):
        return semantic_dup_pairs(
            e, threshold=0.45, n_centroids=cells, n_assign=2,
            train_sample=2048,
        ).count()

    _sem(emb, 8)  # warm
    t0 = time.perf_counter()
    n_base = _sem(emb, 8)
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_big = _sem(emb_big, 8 * factor)
    t_big = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "semdedup_cells",
                "factor": factor,
                "pairs_base": n_base,
                "pairs_big": n_big,
                "sec_base": round(t_base, 2),
                "sec_big": round(t_big, 2),
                "growth_vs_linear": round(t_big / (t_base * factor), 2),
            }
        )
    )


    # q176 KS-matrix probe: the pairwise CDF grid is the one stats-family
    # output that grows QUADRATICALLY in a dimension the corpus owner
    # controls — the source count s (pairs = s(s-1)/2). Inflate SOURCES
    # (each copy keeps the same 25 docs under a renamed source), measure
    # the all-pairs plan, and report growth against both the linear and
    # the quadratic law; the docstring cutover (sketch-KS q170 above
    # ~200 sources) is pinned from this measurement.
    docs_src = table(spark, sf_dir, "documents").select("source", "n_chars")

    def _src_big(d, s_factor):
        cps = spark.range(s_factor).select(F.col("id").alias("__copy"))
        return d.crossJoin(F.broadcast(cps)).select(
            F.concat_ws(
                "_", "source", F.col("__copy").cast("string")
            ).alias("source"),
            "n_chars",
        )

    def _ks_matrix_pairs(d):
        # the q176 plan shape: one corpus collapse, zero-filled
        # (sources x lengths) grid, per-source running CDFs, pairwise
        # max-gap self-join on the length key
        from pyspark.sql import Window

        g = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("k"))
        lens = g.select("n_chars").distinct()
        srcs = g.groupBy("source").agg(F.sum("k").alias("n"))
        grid = srcs.crossJoin(F.broadcast(lens))
        c = grid.join(g, ["source", "n_chars"], "left").select(
            "source", "n", "n_chars",
            F.coalesce(F.col("k"), F.lit(0)).alias("k"),
        )
        cum_w = (
            Window.partitionBy("source")
            .orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cdf = c.select(
            "source", "n", "n_chars", F.sum("k").over(cum_w).alias("cum")
        )
        a, b = cdf.alias("a"), cdf.alias("b")
        return (
            a.join(
                b,
                (F.col("a.n_chars") == F.col("b.n_chars"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(F.col("a.source"), F.col("b.source"))
            .agg(
                F.max(
                    F.abs(
                        F.col("a.cum") * F.col("b.n")
                        - F.col("b.cum") * F.col("a.n")
                    )
                ).alias("dnum")
            )
            .count()
        )

    _ks_matrix_pairs(docs_src)  # warm
    t0 = time.perf_counter()
    p_base = _ks_matrix_pairs(docs_src)
    t_base = time.perf_counter() - t0
    big_src = _src_big(docs_src, factor).persist()
    big_src.count()
    t0 = time.perf_counter()
    p_big = _ks_matrix_pairs(big_src)
    t_big = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "ks_matrix_sources2",
                "factor": factor,
                "pairs_base": p_base,
                "pairs_big": p_big,
                "sec_base": round(t_base, 2),
                "sec_big": round(t_big, 2),
                "growth_vs_linear": round(t_big / (t_base * factor), 2),
                "growth_vs_quadratic": round(
                    t_big / (t_base * factor * factor), 2
                ),
            }
        )
    )

    # the EXECUTABLE cutover (ks_matrix_decisions / q196): above the
    # measured ~1,000-source ceiling, kilobyte-per-source quantile
    # summaries screen every pair and only straddlers pay the exact
    # grid, restricted to those pairs. Law at `factor`x sources:
    # decisions identical to the exact path; screened fraction and both
    # wall-clocks reported so the cutover's economics stay measured.
    from decimal import ROUND_HALF_UP, Decimal

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.quantiles import (
        quantile_summary_by,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.stats_q import (
        _ks_bonf_crit,
        _ks_grid_pairs,
        _ks_sketch_screen,
    )

    def _r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def _rejects_of(rows, crit_of):
        return {
            (r.source_a, r.source_b): int(
                _r6(int(r.dnum) / (1.0 * r.na * r.nb))
                > _r6(crit_of(r.na, r.nb))
            )
            for r in rows
        }

    n_src_big = big_src.select("source").distinct().count()
    crit_of = _ks_bonf_crit(n_src_big)
    t0 = time.perf_counter()
    ex = _rejects_of(_ks_grid_pairs(big_src).collect(), crit_of)
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    summ = quantile_summary_by(big_src, "n_chars", "source", eps=0.02)
    decided, undecided, _info = _ks_sketch_screen(summ, crit_of)
    sk = {(a, b): r for a, b, r in decided}
    if undecided:
        pairs = spark.createDataFrame(
            undecided, "source_a string, source_b string"
        )
        sk.update(
            _rejects_of(
                _ks_grid_pairs(big_src, pairs=pairs).collect(), crit_of
            )
        )
    t_sketch = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "ks_sketch_cutover",
                "sources": n_src_big,
                "pairs": len(ex),
                "screened": len(decided),
                "undecided": len(undecided),
                "decisions_agree": sum(
                    1 for k in ex if sk.get(k) == ex[k]
                ) == len(ex),
                "sec_exact": round(t_exact, 2),
                "sec_sketch_path": round(t_sketch, 2),
            }
        )
    )


    # q195 daily-bands probe: the per-day cumulative window parallelizes
    # across the calendar — until one HOT day owns most of the corpus
    # (an incident day, a backfill). Inflate 10x twice: spread across 10
    # synthetic days vs ALL copies landing on one day (values jittered
    # per copy so the grouped (day, value) table grows with the data,
    # not just the counts), and compare the band computation.
    ev_src = table(spark, sf_dir, "events").select("ts", "value")

    def _bands_rows(e):
        from pyspark.sql import Window as W

        us = F.expr(
            "timestampdiff(MICROSECOND,"
            " timestamp_ntz'2024-01-01 00:00:00', ts)"
        )
        g = (
            e.select(F.floor(us / 86_400_000_000).alias("day"),
                     F.col("value").alias("v"))
            .groupBy("day", "v")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wd = W.partitionBy("day")
        w = g.select(
            "day",
            "v",
            F.sum("c").over(
                wd.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
            ).alias("cum"),
            F.sum("c").over(wd).alias("n"),
        )
        k50 = F.greatest(F.lit(1), F.expr("(n + 1) div 2"))
        return (
            w.groupBy("day")
            .agg(F.min(F.when(F.col("cum") >= k50, F.col("v"))).alias("p50"))
            .count()
        )

    cps = spark.range(factor).select(F.col("id").alias("__copy"))
    jitter = F.col("value") + F.col("__copy") * F.lit(1e-7)
    spread = (
        ev_src.crossJoin(F.broadcast(cps))
        .select(
            (F.col("ts") + F.make_interval(days=F.col("__copy").cast("int")))
            .alias("ts"),
            jitter.alias("value"),
        )
        .persist()
    )
    hot = (
        ev_src.crossJoin(F.broadcast(cps))
        .select(
            F.lit("2024-01-15 12:00:00").cast("timestamp_ntz").alias("ts"),
            jitter.alias("value"),
        )
        .persist()
    )
    spread.count(), hot.count()
    _bands_rows(spread)  # warm
    t0 = time.perf_counter()
    d_spread = _bands_rows(spread)
    t_spread = time.perf_counter() - t0
    t0 = time.perf_counter()
    d_hot = _bands_rows(hot)
    t_hot = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "daily_bands_hot_day",
                "factor": factor,
                "days_spread": d_spread,
                "days_hot": d_hot,
                "sec_spread": round(t_spread, 2),
                "sec_hot": round(t_hot, 2),
                "skew_overhead": round(t_hot / max(t_spread, 1e-9), 2),
            }
        )
    )

    # q209's 6-way warehouse join (TPC-H Q5 shape) under a `factor`x
    # lineitem: the selective date filter prunes orders at the scan,
    # nation/region broadcast unconditionally (fixed cardinality), the
    # supplier branch is broadcast_if_small-gated (mirrors q209), and
    # the ONLY fact-fact shuffle is the orderkey join — so wall-clock
    # should track the filtered fact volume, not the 6-way join's
    # nominal input product. A third leg inflates SUPPLIER `factor`x
    # under a forced-low gate (cap 1 row), so the supplier join runs
    # as the ungated shuffle/AQE path a 100 TB supplier would take —
    # measuring that the degrade completes and agrees with the
    # broadcast plan's totals instead of asserting it.
    li0 = table(spark, sf_dir, "lineitem")

    def _q5(li, sup_factor=1, gate_rows=2_000_000):
        oo = table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        c5 = table(spark, sf_dir, "customer")
        s5 = table(spark, sf_dir, "supplier")
        if sup_factor > 1:
            # duplicate supplier rows (suppkey kept) so the join output
            # multiplies exactly sup_factor x — a size-only inflation
            reps = spark.range(sup_factor).select(F.col("id").alias("__r"))
            s5 = s5.crossJoin(F.broadcast(reps)).drop("__r")
        n5 = table(spark, sf_dir, "nation")
        r5 = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
        sup = s5.join(
            F.broadcast(
                n5.join(F.broadcast(r5), n5.n_regionkey == r5.r_regionkey)
            ),
            s5.s_nationkey == F.col("n_nationkey"),
        )
        rows = (
            li.join(oo, li.l_orderkey == oo.o_orderkey)
            .join(c5, oo.o_custkey == c5.c_custkey)
            .join(
                broadcast_if_small(sup, max_rows=gate_rows),
                (li.l_suppkey == sup.s_suppkey)
                & (c5.c_nationkey == sup.s_nationkey),
            )
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("rev")
            )
            .collect()
        )
        return {r["n_name"]: r["rev"] for r in rows}

    _q5(li0)  # warm
    t0 = time.perf_counter()
    res_base5 = _q5(li0)
    t_base5 = time.perf_counter() - t0
    cps5 = spark.range(factor).select(F.col("id").alias("__c"))
    big5 = li0.crossJoin(F.broadcast(cps5)).drop("__c").persist()
    big5.count()
    t0 = time.perf_counter()
    _q5(big5)
    t_big5 = time.perf_counter() - t0
    # gate leg: supplier inflated factor x AND the broadcast gate forced
    # below it — the supplier join must degrade to the shuffle/AQE path
    # and still produce factor x the broadcast-plan revenue per nation.
    t0 = time.perf_counter()
    res_gate5 = _q5(li0, sup_factor=factor, gate_rows=1)
    t_gate5 = time.perf_counter() - t0
    gate_ok = set(res_gate5) == set(res_base5) and all(
        abs(res_gate5[k] - factor * res_base5[k]) <= 0.5 * factor
        for k in res_base5
    )
    print(
        json.dumps(
            {
                "probe": "warehouse_join_q5",
                "factor": factor,
                "sec_base": round(t_base5, 2),
                "sec_big": round(t_big5, 2),
                "growth_vs_linear": round(t_big5 / (t_base5 * factor), 2),
                "sec_gated_shuffle": round(t_gate5, 2),
                "gate_degrade_ok": gate_ok,
            }
        )
    )
    big5.unpersist()

    # q248's Heaps'-law collapse under a `factor`x corpus whose VOCABULARY
    # also grows factor x (the copy-suffixed tokens of docs_big — the
    # hostile case for the (source, word) grouped count: both the group
    # count and the distinct-key cardinality scale). Wall should track
    # token volume; super-linear growth would flag the per-source distinct
    # reduction as a 100 TB bottleneck.
    def _heaps(d):
        u = d.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        g = (
            u.groupBy("source", "w")
            .agg(F.count(F.lit(1)).alias("cw"))
            .groupBy("source")
            .agg(
                F.sum("cw").alias("tokens"),
                F.count(F.lit(1)).alias("types"),
            )
        )
        p = g.select(
            F.log(F.col("tokens").cast("double")).alias("x"),
            F.log(F.col("types").cast("double")).alias("y"),
        )
        return p.agg(
            F.count(F.lit(1)), F.sum(F.col("x") * F.col("y"))
        ).collect()[0][0]

    hd = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    hd_big = inflate(hd, factor, ["doc_id"], text_col="text").persist()
    hd_big.count()
    _heaps(hd)  # warm
    t0 = time.perf_counter()
    _heaps(hd)
    t_hb = time.perf_counter() - t0
    t0 = time.perf_counter()
    _heaps(hd_big)
    t_hg = time.perf_counter() - t0
    hd_big.unpersist()
    print(
        json.dumps(
            {
                "probe": "heaps_vocab_growth",
                "factor": factor,
                "sec_base": round(t_hb, 2),
                "sec_big": round(t_hg, 2),
                "growth_vs_linear": round(t_hg / (t_hb * factor), 2),
            }
        )
    )

    # q241's Pareto ranking under `factor`x lineitem with DISJOINT part
    # keys per copy, so the ranked part table itself grows factor x —
    # the case the distributed prefix sum exists for (a single-partition
    # OVER () window would serialize here). Wall should track the part
    # count; the fact-side groupBy is the other linear term.
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.ranking import (
        global_running_sums,
    )

    def _pareto(li):
        cents = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0, 0
        ).cast("bigint")
        r = (
            li.select(F.col("l_partkey"), cents.alias("c"))
            .groupBy("l_partkey")
            .agg(F.sum("c").alias("rev"))
        )
        order = [F.col("rev").desc(), F.col("l_partkey")]
        cum = global_running_sums(
            r, order=order, value=F.col("rev"), sum_col="cum",
            num_partitions=32,
        )
        rk = global_running_sums(
            cum, order=order, value=F.lit(1), sum_col="rk",
            num_partitions=32,
        )
        return rk.where(F.col("rk") % 977 == 0).count()

    li_parts_big = inflate(li0, factor, ["l_partkey"]).persist()
    li_parts_big.count()
    _pareto(li0)  # warm
    t0 = time.perf_counter()
    _pareto(li0)
    t_pb = time.perf_counter() - t0
    t0 = time.perf_counter()
    _pareto(li_parts_big)
    t_pg = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "probe": "pareto_prefix_sum",
                "factor": factor,
                "sec_base": round(t_pb, 2),
                "sec_big": round(t_pg, 2),
                "growth_vs_linear": round(t_pg / (t_pb * factor), 2),
            }
        )
    )
    li_parts_big.unpersist()

    # q230's RANGE-frame trailing window under a HOT-CUSTOMER layout
    # (r14 verdict #6): `factor`x orders, once with disjoint custkeys per
    # copy (clean scaling: more partitions, same per-key size) and once
    # with ONE custkey owning ~10% of all rows (the skew case: the
    # two-pointer frame is O(n) per partition but a single partition =
    # a single task, so the hot key serializes ~factor x the base table
    # through one thread). The uniform leg should track ~linear; the hot
    # leg measures the straggler law the docstring documents — and is
    # the quantified argument for day-bucket pre-aggregation if a real
    # deployment ever shows one entity owning a double-digit share.
    from pyspark.sql import Window as _W

    def _range_frame(o):
        day = F.expr(
            "timestampdiff(MICROSECOND,"
            " timestamp_ntz'1970-01-01 00:00:00', o_orderdate)"
            " div 86400000000"
        )
        w = (
            _W.partitionBy("o_custkey")
            .orderBy("day")
            .rangeBetween(-29, _W.currentRow)
        )
        prof = o.select(
            "o_custkey", "o_totalprice", day.alias("day")
        ).select(
            F.sum("o_totalprice").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        )
        return prof.agg(F.sum("s"), F.sum("n")).collect()[0][1]

    from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table as _table

    o0 = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    o_uni = inflate(o0, factor, ["o_orderkey", "o_custkey"]).persist()
    o_uni.count()
    # hot layout: same volume, but copy 0's rows all collapse onto ONE
    # custkey (~1/factor = 10% of the big table on a single window key)
    o_hot = (
        inflate(o0, factor, ["o_orderkey"])
        .withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") < 10_000_000, F.lit(1).cast("bigint")
            ).otherwise(F.col("o_custkey")),
        )
        .persist()
    )
    o_hot.count()
    _range_frame(o0)  # warm
    t0 = time.perf_counter()
    _range_frame(o0)
    t_rb = time.perf_counter() - t0
    t0 = time.perf_counter()
    _range_frame(o_uni)
    t_ru = time.perf_counter() - t0
    t0 = time.perf_counter()
    _range_frame(o_hot)
    t_rh = time.perf_counter() - t0
    o_uni.unpersist()
    o_hot.unpersist()
    print(
        json.dumps(
            {
                "probe": "range_frame_skew",
                "factor": factor,
                "sec_base": round(t_rb, 2),
                "sec_big_uniform": round(t_ru, 2),
                "sec_big_hot": round(t_rh, 2),
                "uniform_vs_linear": round(t_ru / (t_rb * factor), 2),
                "hot_vs_uniform": round(t_rh / t_ru, 2),
            }
        )
    )

    # q264's exact gap percentiles under `factor`x events with DISJOINT
    # users: the (type, gap_s) grouped domain grows with the data (new
    # users mint new gap values), so this measures the grouped-count +
    # bounded-window rank probe against the worst growth direction.
    def _gap_pct(e):
        from pyspark.sql import Window as _W2

        us = F.expr(
            "timestampdiff(MICROSECOND,"
            " timestamp_ntz'2024-01-01 00:00:00', ts)"
        )
        w = _W2.partitionBy("user_id").orderBy("us", "event_id")
        g = (
            e.select("user_id", "event_id", "event_type", us.alias("us"))
            .select(
                "event_type",
                F.expr(
                    "(lead(us) over (partition by user_id"
                    " order by us, event_id) - us) div 1000000"
                ).alias("gap_s"),
            )
            .where(F.col("gap_s").isNotNull())
            .groupBy("event_type", "gap_s")
            .agg(F.count(F.lit(1)).alias("k"))
        )
        by_type = _W2.partitionBy("event_type")
        w2 = g.select(
            "event_type", "gap_s",
            F.sum("k").over(by_type).alias("n"),
            F.sum("k").over(
                by_type.orderBy("gap_s")
                .rowsBetween(_W2.unboundedPreceding, _W2.currentRow)
            ).alias("cum"),
        )
        return (
            w2.groupBy("event_type")
            .agg(
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n + 1) div 2"),
                        F.col("gap_s"),
                    )
                ).alias("p50"),
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(9 * n + 9) div 10"),
                        F.col("gap_s"),
                    )
                ).alias("p90"),
            )
            .count()
        )

    ev0 = table(spark, sf_dir, "events")
    ev_big = inflate(ev0, factor, ["event_id", "user_id"]).persist()
    ev_big.count()
    _gap_pct(ev0)  # warm
    t0 = time.perf_counter(); _gap_pct(ev0); t_gb = time.perf_counter() - t0
    t0 = time.perf_counter(); _gap_pct(ev_big); t_gg = time.perf_counter() - t0
    ev_big.unpersist()
    print(json.dumps({
        "probe": "interevent_percentiles",
        "factor": factor,
        "sec_base": round(t_gb, 2),
        "sec_big": round(t_gg, 2),
        "growth_vs_linear": round(t_gg / (t_gb * factor), 2),
    }))

    # q267's basket-pair fan-out under `factor`x lineitem with DISJOINT
    # orderkeys: pairs-per-order stays bounded (<= C(brands,2)), so the
    # pair table grows linearly with orders — the law that makes
    # brand-level (not partkey-level) pairing the scale-honest choice.
    def _basket(li, p):
        ob = (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select(F.col("l_orderkey").alias("ok"),
                    F.col("p_brand").alias("brand"))
            .repartition("ok")  # r16: one fact exchange (q267 shape)
            .distinct()
        )
        a = ob.select("ok", F.col("brand").alias("ba"))
        b = ob.select(F.col("ok").alias("ok2"), F.col("brand").alias("bb"))
        return (
            a.join(b, (F.col("ok2") == F.col("ok"))
                   & (F.col("bb") > F.col("ba")))
            .groupBy("ba", "bb").agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    p0 = table(spark, sf_dir, "part")
    li_ord_big = inflate(li0, factor, ["l_orderkey"]).persist()
    li_ord_big.count()
    _basket(li0, p0)  # warm
    t0 = time.perf_counter(); _basket(li0, p0); t_bb = time.perf_counter() - t0
    t0 = time.perf_counter(); _basket(li_ord_big, p0); t_bg = time.perf_counter() - t0
    li_ord_big.unpersist()
    print(json.dumps({
        "probe": "basket_pair_lift",
        "factor": factor,
        "sec_base": round(t_bb, 2),
        "sec_big": round(t_bg, 2),
        "growth_vs_linear": round(t_bg / (t_bb * factor), 2),
    }))

    # q287's epoch shuffle under `factor`x documents with DISJOINT ids:
    # one range exchange + local sorts, so wall-clock must track the
    # data linearly (the law that makes per-epoch reshuffling affordable
    # as a routine pre-training step rather than a batch-job event).
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_shuffle,
    )

    def _eposh(d, nparts):
        return epoch_shuffle(
            d, "doc_id", epoch=3, shards=16, n_partitions=nparts
        ).count()

    d0 = table(spark, sf_dir, "documents").select("doc_id")
    d_big = inflate(d0, factor, ["doc_id"]).persist()
    d_big.count()
    _eposh(d0, 32)  # warm
    t0 = time.perf_counter(); _eposh(d0, 32); t_eb = time.perf_counter() - t0
    t0 = time.perf_counter(); _eposh(d_big, 32); t_eg = time.perf_counter() - t0
    d_big.unpersist()
    print(json.dumps({
        "probe": "epoch_shuffle",
        "factor": factor,
        "sec_base": round(t_eb, 2),
        "sec_big": round(t_eg, 2),
        "growth_vs_linear": round(t_eg / (t_eb * factor), 2),
    }))

    # q290's Poisson bootstrap under `factor`x orders with DISJOINT
    # orderkeys, in the round-17 shipped shape: the B x orders weight
    # pass runs as a vectorized numpy kernel inside ONE mapInArrow over
    # (orderkey, cents), emitting B partial-sum rows per task, so the
    # resample aggregate must stay linear in the corpus (B is constant,
    # per-task state is B longs) — a super-linear reading would mean
    # the kernel's work no longer tracks the scan.
    def _boot(o):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.stats_q import (
            _BOOT_B,
            _POIS_KEYS,
        )

        n_boot, keys = _BOOT_B, _POIS_KEYS
        dec = "decimal(38,0)"
        oc = o.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100.0, 0).cast("long")
            .alias("cents"),
        )

        def kern(batches):
            import numpy as np
            import pyarrow as pa

            m32 = np.uint64(0xFFFFFFFF)
            c = np.uint64(2654435761)
            bvals = (np.arange(n_boot, dtype=np.uint64)
                     + np.uint64(2654435769)) & m32
            masks = (bvals * c) & m32
            pws = np.zeros(n_boot, dtype=np.int64)
            pwn = np.zeros(n_boot, dtype=np.int64)
            for batch in batches:
                # same loud-null guard as the q290 kernel (ADVICE r17)
                if (batch.column(0).null_count
                        or batch.column(1).null_count):
                    raise ValueError(
                        "bootstrap kernel: null key/cents in batch"
                    )
                ok = batch.column(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.uint64) & m32
                cents = batch.column(1).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                for b in range(n_boot):
                    x = ok ^ masks[b]
                    m1 = (x * c) & m32
                    x1 = m1 ^ (m1 >> np.uint64(16))
                    m2 = (x1 * c) & m32
                    key = m2 ^ (m2 >> np.uint64(16))
                    w = (key > np.uint64(keys[0])).astype(np.int64)
                    for t in keys[1:]:
                        w += key > np.uint64(t)
                    pws[b] += int(np.dot(w, cents))
                    pwn[b] += int(w.sum())
            yield pa.record_batch({
                "b": pa.array(np.arange(n_boot, dtype=np.int32)),
                "pws": pa.array(pws),
                "pwn": pa.array(pwn),
            })

        sub = oc.mapInArrow(kern, "b int, pws long, pwn long")
        return sub.groupBy("b").agg(
            F.sum(F.col("pws").cast(dec)).alias("ws"),
            F.sum("pwn").alias("wn"),
        ).count()

    o0 = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    o_big2 = inflate(o0, factor, ["o_orderkey"]).persist()
    o_big2.count()
    _boot(o0)  # warm
    t0 = time.perf_counter(); _boot(o0); t_ob = time.perf_counter() - t0
    t0 = time.perf_counter(); _boot(o_big2); t_og = time.perf_counter() - t0
    o_big2.unpersist()
    print(json.dumps({
        "probe": "bootstrap_resample",
        "factor": factor,
        "sec_base": round(t_ob, 2),
        "sec_big": round(t_og, 2),
        "growth_vs_linear": round(t_og / (t_ob * factor), 2),
    }))

    # ---- round-17 second-wave probes (VERDICT r16 #6) --------------------

    # q292 quantile normalization under a SKEWED source mix: 90% of the
    # inflated copies collapse into one bulk source AND n_chars gets a
    # per-copy offset, so the per-source count table stays tiny while the
    # (length, count) grouped collapse — the one corpus-sized shuffle —
    # genuinely grows ~factor x in distinct keys. Super-linear growth
    # would flag the cumulative window or the probe-grid fold scaling
    # with docs instead of with distinct lengths.
    def _qnorm(d):
        from pyspark.sql import Window as W

        c = d.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
        t = d.agg(F.count(F.lit(1)).alias("n"))
        v = d.groupBy(F.col("n_chars").alias("l")).agg(
            F.count(F.lit(1)).alias("k")
        )
        cum = v.select(
            "l",
            F.sum("k").over(
                W.orderBy("l").rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("cm"),
        )
        qs = spark.range(1, 4).select(F.col("id").alias("q"))
        pr = c.crossJoin(F.broadcast(qs)).select(
            "source", "ns", "q", F.expr("(q * ns + 3) div 4").alias("rq")
        )
        tr = pr.crossJoin(F.broadcast(t)).select(
            "source", "q",
            F.expr(
                "rq * (n div ns) + (rq * (n % ns) + ns - 1) div ns"
            ).alias("tr"),
        )
        return (
            tr.crossJoin(cum)
            .groupBy("source", (F.col("q") * 25).cast("int").alias("pct"))
            .agg(F.min(F.when(F.col("cm") >= F.col("tr"), F.col("l")))
                 .alias("norm_chars"))
            .count()
        )

    dq = table(spark, sf_dir, "documents").select("source", "n_chars")
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    dq_big = (
        dq.crossJoin(F.broadcast(copies))
        .select(
            F.when(F.col("__copy") > 0, F.lit("bulk_crawl"))
            .otherwise(F.col("source")).alias("source"),
            (F.col("n_chars") + F.col("__copy") * 100_000).alias("n_chars"),
        )
        .persist()
    )
    dq_big.count()
    _qnorm(dq)  # warm
    t0 = time.perf_counter(); _qnorm(dq); t_qb = time.perf_counter() - t0
    t0 = time.perf_counter(); _qnorm(dq_big); t_qg = time.perf_counter() - t0
    dq_big.unpersist()
    print(json.dumps({
        "probe": "quantile_norm_skewed_source",
        "factor": factor,
        "sec_base": round(t_qb, 2),
        "sec_big": round(t_qg, 2),
        "growth_vs_linear": round(t_qg / (t_qb * factor), 2),
    }))

    # q293 Z-order layout key under a HOT key range: 90% of inflated rows
    # collapse onto a single (xq, yq) point, so one z-bucket holds ~90%
    # of the corpus. The manifest is a 64-group aggregate with map-side
    # combine — partial aggregation must absorb the hot bucket (each
    # task emits at most 64 rows regardless of skew); super-linear
    # growth would flag the bucket reducer inheriting the skew.
    def _zmanifest(li):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
            zorder_key,
        )

        b = li.select(
            (F.col("l_partkey") % 256).cast("bigint").alias("xq"),
            (F.col("l_suppkey") % 256).cast("bigint").alias("yq"),
        )
        z = b.select("xq", "yq", zorder_key("xq", "yq", 8).alias("zv"))
        return (
            z.select((F.col("zv") * 64 / 65536).cast("int").alias("zb"),
                     "xq", "yq")
            .groupBy("zb")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("xq"), F.max("xq"), F.min("yq"), F.max("yq"))
            .count()
        )

    lz = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    lz_big = (
        lz.crossJoin(F.broadcast(copies))
        .select(
            F.when(F.col("__copy") > 0, F.lit(7)).otherwise(
                F.col("l_partkey")
            ).alias("l_partkey"),
            F.when(F.col("__copy") > 0, F.lit(11)).otherwise(
                F.col("l_suppkey")
            ).alias("l_suppkey"),
        )
        .persist()
    )
    lz_big.count()
    _zmanifest(lz)  # warm
    t0 = time.perf_counter(); _zmanifest(lz); t_zb = time.perf_counter() - t0
    t0 = time.perf_counter(); _zmanifest(lz_big); t_zg = time.perf_counter() - t0
    lz_big.unpersist()
    print(json.dumps({
        "probe": "zorder_hot_key_range",
        "factor": factor,
        "sec_base": round(t_zb, 2),
        "sec_big": round(t_zg, 2),
        "growth_vs_linear": round(t_zg / (t_zb * factor), 2),
    }))

    # q294 SRM guard under 99:1 user skew: inflation maps 99% of copies'
    # events onto ONE hot user_id. The plan is DISTINCT -> map-side arm
    # hash -> 2-cell aggregate; partial distinct must collapse the hot
    # key map-side (each task emits the hot user once), so wall-clock
    # tracks raw event volume, never the hot key's row count landing on
    # one reducer.
    def _srm(e):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
            mul_hash32,
        )

        u = e.select("user_id").distinct()
        a = u.select(
            F.pmod(mul_hash32(F.col("user_id") + F.lit(4242)), F.lit(2))
            .alias("arm")
        )
        return a.agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum("arm").alias("n_b"),
        ).count()

    ev0 = table(spark, sf_dir, "events").select("user_id")
    ev_big = (
        ev0.crossJoin(F.broadcast(copies))
        .select(
            F.when(F.col("__copy") > 0, F.lit(424242)).otherwise(
                F.col("user_id")
            ).alias("user_id")
        )
        .persist()
    )
    ev_big.count()
    _srm(ev0)  # warm
    t0 = time.perf_counter(); _srm(ev0); t_sb = time.perf_counter() - t0
    t0 = time.perf_counter(); _srm(ev_big); t_sg = time.perf_counter() - t0
    ev_big.unpersist()
    print(json.dumps({
        "probe": "srm_user_skew",
        "factor": factor,
        "sec_base": round(t_sb, 2),
        "sec_big": round(t_sg, 2),
        "growth_vs_linear": round(t_sg / (t_sb * factor), 2),
    }))

    # q295 incremental ANN maintenance: the nightly batch is FIXED-size
    # while the stored corpus index grows `factor`x — the refresh cost
    # must track the BATCH (flat, growth_vs_linear ~ 1/factor), because
    # only the batch is encoded and the stored index is read as data.
    # A growth reading near 1.0 would mean the corpus is being
    # re-encoded per refresh — the exact failure the operator exists to
    # avoid. (The denominator convention is shared with every probe:
    # growth_vs_linear = t_big / (t_base * factor).)
    def _inc_update(stored_idx, batch_df, coarse, books):
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.similarity import (
            ivfpq_index_update,
        )

        return ivfpq_index_update(
            stored_idx, batch_df, coarse, books, n_assign=2
        ).count()

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.similarity import (
        build_ivfpq_index,
        train_ivfpq,
    )

    emb = table(spark, sf_dir, "embeddings")
    batch_df = emb.filter(F.col("doc_id") % 97 == 0) if "doc_id" in (
        emb.columns
    ) else emb.filter(F.col("vec_id") % 97 == 0)
    corpus0 = emb.subtract(batch_df)
    corpus_big = inflate(corpus0, factor, ["vec_id"]).persist()
    corpus_big.count()
    coarse, books = train_ivfpq(corpus0, n_centroids=8, m=8, k=16)
    idx0 = build_ivfpq_index(corpus0, coarse, books, n_assign=2).persist()
    idx0.count()
    idx_big = build_ivfpq_index(
        corpus_big, coarse, books, n_assign=2
    ).persist()
    idx_big.count()
    _inc_update(idx0, batch_df, coarse, books)  # warm
    t0 = time.perf_counter()
    _inc_update(idx0, batch_df, coarse, books)
    t_ib = time.perf_counter() - t0
    t0 = time.perf_counter()
    _inc_update(idx_big, batch_df, coarse, books)
    t_ig = time.perf_counter() - t0
    idx0.unpersist(); idx_big.unpersist(); corpus_big.unpersist()
    print(json.dumps({
        "probe": "incremental_ann_update",
        "factor": factor,
        "sec_base": round(t_ib, 2),
        "sec_big": round(t_ig, 2),
        "growth_vs_linear": round(t_ig / (t_ib * factor), 2),
    }))


if __name__ == "__main__":
    main()
