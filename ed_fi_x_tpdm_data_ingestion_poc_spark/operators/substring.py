"""Offset-insensitive exact-substring dedup: find document pairs sharing
a VERBATIM token run of length >= N at ANY alignment — the suffix-array-
style curation operator of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), re-expressed for a distributed engine
as winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Why this and not q92's segment dedup: segment_dedup hashes FIXED
16-token-aligned segments, so a duplicated passage shifted by even one
token across documents never collides. Here every token position
participates:

  1. k-gram hashes: xxhash64 of each k-token gram, all positions
     (stride 1) — a doc of t tokens yields t-k+1 gram hashes.
  2. Winnowing: over each window of w = N-k+1 consecutive gram hashes,
     select the MINIMUM hash. Selection depends only on window content,
     so the theorem holds: two documents sharing a verbatim run of
     >= w+k-1 = N tokens share at least one complete gram window, whose
     minimum value is selected in BOTH — a guaranteed common
     fingerprint (no candidate misses), at an expected index density of
     2/(w+1) selected grams per position instead of 1.
  3. Inverted-index self-join on the fingerprint (an 8-byte key): only
     docs sharing a selected hash ever meet — never all-pairs. A
     fingerprint document-frequency cap (fp_cap) drops
     boilerplate-degenerate hot keys, the same guard as
     dedup.shingle_index's df_cap.
  4. Exact verification: candidate pairs (rare) join back to their full
     N-gram STRING sets and keep only pairs with a non-empty
     intersection. String (not hash) comparison makes the final answer
     EXACT: winnowing guarantees no misses, verification removes any
     hash-collision false positive.

Scale: steps 1-2 are map-only (vectorized numpy per Arrow batch — see
winnow_fingerprint_index for why not inline JVM expressions); 3 shuffles
8-byte hashes, not text; 4 touches only candidate docs via a semi join.

Reference parity: the reference engine has no dedup surface at all
(banner-connector is row-at-a-time Java ETL, Dao.java); this operator is
part of the mandated beyond-reference LLM-curation surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngrams(text_col: Column, n: int) -> Column:
    """All n-token grams of a space-tokenized text as STRINGS, stride 1,
    array_distinct'd. Empty array when the doc has fewer than n tokens
    (a guarded sequence — Spark's sequence(1, 0) would count DOWN)."""
    toks = F.split(text_col, " ")
    n_grams = F.size(toks) - (n - 1)
    return F.when(n_grams < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def gram_hashes(text_col: Column, k: int) -> Column:
    """xxhash64 of every k-token gram, stride 1, in position order (NOT
    distinct — winnowing needs the positional sequence). Empty array when
    the doc has fewer than k tokens."""
    toks = F.split(text_col, " ")
    n_grams = F.size(toks) - (k - 1)
    return F.when(n_grams < 1, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.xxhash64(F.array_join(F.slice(toks, i, k), " ")),
        )
    )


def window_minima(grams_col: Column, w: int) -> Column:
    """Distinct minima over every w-window of an ALREADY-MATERIALIZED
    bigint array — the winnowing selection step. Keep the gram array a
    real column (its own projection), NOT an inline expression: a nested
    higher-order expression re-evaluates the whole gram computation per
    window element (measured 9 s -> 0.4 s on 500 docs for the split)."""
    n_windows = F.size(grams_col) - (w - 1)
    return F.when(n_windows < 1, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(grams_col, j, w)),
            )
        )
    )


def winnow_fingerprint_index(
    docs: DataFrame,
    *,
    min_tokens: int = 24,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp) inverted-index rows: winnowing fingerprints = distinct
    window-minima of the hashed k-gram sequence, window
    w = min_tokens - k + 1. Guarantee (SIGMOD'03): any two docs sharing
    a verbatim run of >= min_tokens tokens share at least one
    fingerprint. Docs under min_tokens tokens yield no rows (they cannot
    contain such a run). Fingerprints are VALUES (not positions), so
    equal-hash ties need no tie-break: the shared window's minimum value
    lands in both docs' sets.

    Vectorized numpy per Arrow batch (one pd.util.hash_array pass over
    the batch's grams + sliding_window_view minima), the same choice as
    dedup.shingle_index. The all-JVM expression form (gram_hashes +
    window_minima above) is NOT used here deliberately: explode over the
    computed array triggers InferFiltersFromGenerate, and filter
    pushdown substitutes the whole nested winnow expression into an
    interpreted scan-side Filter that re-evaluates the gram array per
    window element — measured 15 s vs 0.5 s on 500 docs. mapInPandas is
    a pushdown barrier, so the inferred IS NOT NULL lands on cheap
    columns only."""
    if k < 1 or min_tokens <= k:
        raise ValueError(f"need 1 <= k < min_tokens, got k={k} N={min_tokens}")
    w = min_tokens - k + 1

    def winnow_batches(batches):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"id": np.array([], dtype="int64"), "fp": np.array([], dtype="int64")}
        )
        for pdf in batches:
            ids, counts, grams = [], [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                toks = text.split(" ")
                # < min_tokens tokens -> cannot contain an N-run: no grams
                n_g = len(toks) - k + 1 if len(toks) >= min_tokens else 0
                ids.append(rid)
                counts.append(max(n_g, 0))
                grams.extend(
                    " ".join(toks[j : j + k]) for j in range(max(n_g, 0))
                )
            if not grams:
                yield empty
                continue
            # one vectorized hash over the whole batch's grams (the
            # per-doc-loop alternative measured ~5x slower in
            # shingle_index; same trade here)
            h = pd.util.hash_array(
                np.asarray(grams, dtype=object)
            ).view("int64")
            out_ids, out_fps, off = [], [], 0
            for rid, c in zip(ids, counts):
                if c >= w:
                    mins = np.lib.stride_tricks.sliding_window_view(
                        h[off : off + c], w
                    ).min(axis=1)
                    u = np.unique(mins)
                    out_ids.append(np.full(len(u), rid, dtype="int64"))
                    out_fps.append(u)
                off += c
            if not out_ids:
                yield empty
                continue
            yield pd.DataFrame(
                {"id": np.concatenate(out_ids), "fp": np.concatenate(out_fps)}
            )

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .repartition(par)  # corpus often arrives as one file = one partition
        .mapInPandas(winnow_batches, "id long, fp long")
    )


def substring_dup_pairs(
    docs: DataFrame,
    *,
    min_tokens: int = 24,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_cap: int | None = None,
) -> DataFrame:
    """EXACT pairs of documents sharing a verbatim token run of length
    >= min_tokens at any alignment: (ida, idb, n_shared) with ida < idb,
    n_shared = number of distinct shared min_tokens-grams (a proxy for
    how long/how many the shared passages are; a single shared run of
    L >= min_tokens tokens contributes L - min_tokens + 1).

    fp_cap (optional): drop fingerprints appearing in more than fp_cap
    docs before pairing — the boilerplate guard. With a cap the result
    is complete for passages NOT shared corpus-wide; leave None for the
    exact answer (testdata scale) and set it (e.g. 128) on real web
    corpora where a license header may appear in millions of docs —
    those want the corpus-frequency treatment (qz107's CMS), not a
    quadratic pair list.
    """
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    idx = winnow_fingerprint_index(
        base, min_tokens=min_tokens, k=k, id_col="id", text_col="text"
    )
    if fp_cap is not None:
        from pyspark.sql.window import Window

        cnt = Window.partitionBy("fp")
        idx = (
            idx.withColumn("__df", F.count(F.lit(1)).over(cnt))
            .where(F.col("__df") <= fp_cap)
            .drop("__df")
        )
    cand = (
        idx.alias("a")
        .join(idx.alias("b"), "fp")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .distinct()
    )
    # verify on full n-gram STRING sets, fetched only for candidate docs
    cand_ids = cand.select(F.col("ida").alias("id")).union(
        cand.select("idb")
    ).distinct()
    grams = base.join(cand_ids, "id", "left_semi").select(
        "id", token_ngrams(F.col("text"), min_tokens).alias("g")
    )
    return (
        cand.join(grams.select(F.col("id").alias("ida"), F.col("g").alias("ga")), "ida")
        .join(grams.select(F.col("id").alias("idb"), F.col("g").alias("gb")), "idb")
        .select(
            "ida",
            "idb",
            F.size(F.array_intersect("ga", "gb")).alias("n_shared"),
        )
        .where(F.col("n_shared") > 0)
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    n: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-passage CUT LIST — the actionable form of
    exact-substring dedup (Lee et al. ACL 2022 remove verbatim repeats,
    not whole documents): (id, s, e, n_dup_tokens) maximal 1-based token
    spans such that every n-gram starting inside [s, e-n+1] occurs at
    least twice in the corpus (counting multiplicity, so within-doc
    repetition is flagged too — the self-dedup case).

    Plan (all JVM):
      1. posexplode the per-doc n-gram digest array (q92's exploded-
         segment shape, stride 1 instead of aligned) — one row per token
         position, the honest cost of exact span detection (a suffix
         array is the same linear blow-up);
      2. occurrence counts via a partition window over the digest — ONE
         shuffle, no join-back (the q92-measured choice);
      3. duplicated positions -> maximal spans via gaps-and-islands: a
         new island when the gap to the previous duplicated position
         exceeds n (spans that overlap or touch merge).
    Digests are md5 of the gram STRING so DuckDB computes the identical
    key and the whole cut list hash-checks; at corpus scale swap md5 for
    xxhash64 (8-byte shuffle keys; ~1e-13 collision odds at 1e7 grams)."""
    from pyspark.sql.window import Window

    toks = F.split(F.col(text_col), " ")
    n_grams = F.size(toks) - (n - 1)
    grams = F.when(n_grams < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")),
        )
    )
    g = docs.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos0", "g")
    ).select("id", (F.col("pos0") + 1).alias("i"), "g")
    cnt = F.count(F.lit(1)).over(Window.partitionBy("g"))
    dup = g.withColumn("n_occ", cnt).where(F.col("n_occ") >= 2).select("id", "i")
    by_pos = Window.partitionBy("id").orderBy("i")
    brk = F.when(
        (F.col("i") - F.lag("i").over(by_pos)) <= n, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dup.withColumn(
        "island",
        F.sum(brk).over(by_pos.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("i").alias("s"),
            (F.max("i") + (n - 1)).alias("e"),
            (F.max("i") + n - F.min("i")).alias("n_dup_tokens"),
        )
        .select("id", "s", "e", "n_dup_tokens")
    )


def cdc_segments(
    docs: DataFrame,
    *,
    k: int = 4,
    boundary_prefix: str = "0",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking at token granularity (the FastCDC/Rabin
    idea behind storage dedup, here for corpus segments): a segment
    boundary falls AFTER token i whenever the digest of the k-token gram
    ENDING at i starts with `boundary_prefix` (md5 hex; one hex char =
    expected segment length 16 + k). Boundaries depend only on local
    content, so a passage duplicated at a DIFFERENT offset re-synchronizes
    after its first internal boundary and yields the same segments — the
    shift-robustness q92's fixed 16-token alignment lacks, at q92's cost
    (one window shuffle; no inverted index needed).

    Returns (id, seg_no, seg_digest, n_tok): one row per segment, digest =
    md5 of the segment text. md5 on both the boundary rule and the digest
    keeps every value recomputable in DuckDB, so cut lists and dup counts
    hash-check end to end; swap md5 for xxhash64 at scale (cheaper, same
    structure, oracle becomes flag-based)."""
    from pyspark.sql.window import Window

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    flags = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            (i >= k)
            & F.md5(
                F.array_join(F.slice(toks, i - (k - 1), k), " ")
            ).startswith(boundary_prefix),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    rows = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.arrays_zip(toks.alias("tok"), flags.alias("flag"))).alias(
            "j0", "z"
        ),
    ).select(
        "id",
        (F.col("j0") + 1).alias("j"),
        F.col("z.tok").alias("tok"),
        F.col("z.flag").alias("flag"),
    )
    by_j = Window.partitionBy("id").orderBy("j")
    seg_no = F.coalesce(
        F.sum("flag").over(by_j.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        rows.withColumn("seg_no", seg_no)
        .groupBy("id", "seg_no")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("j", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("seg_digest"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a duplicate_spans cut list: (id, n_kept, clean_text) with
    every token inside any [s, e] span removed and the remainder
    re-joined in order — the final step of passage-level dedup (Lee et
    al.: cut the repeated passage, keep the document).

    Plan: tokens posexplode to (id, j, tok) rows; one LEFT ANTI join
    against the span table (equi on id + BETWEEN residual — Spark plans
    the equi part as the join key, the range as a joined filter; span
    lists per doc are tiny); reassembly via sort_array(collect_list)
    groups back to one row per doc. Docs with no spans pass through
    whole. Works at corpus scale because both sides shuffle on doc_id
    once and spans are a vanishing fraction of tokens."""
    toks = F.split(F.col(text_col), " ")
    tok_rows = docs.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("j0", "tok")
    ).select("id", (F.col("j0") + 1).alias("j"), "tok")
    sp = spans.select(
        F.col("id").alias("sid"), F.col("s"), F.col("e")
    )
    kept = tok_rows.join(
        sp,
        (F.col("id") == F.col("sid"))
        & F.col("j").between(F.col("s"), F.col("e")),
        "left_anti",
    )
    return (
        kept.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", "tok"))),
                    lambda st: st["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def substring_dup_pairs_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    *,
    corpus_index: DataFrame | None = None,
    min_tokens: int = 24,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-dup pairs TOUCHING a new batch, against a
    continuously-growing corpus (the nightly-ingestion shape, same
    contract as dedup.minhash_lsh_pairs_incremental): winnow only the
    NEW batch, join its fingerprints against the STORED corpus index
    plus a batch self-join, verify exactly. The corpus is never
    re-fingerprinted; corpus text is touched only for verification and
    only for candidate ids (semi join). Requires disjoint id spaces.

    corpus_index: (id, fp) from winnow_fingerprint_index over the stored
    corpus (SAME min_tokens/k). None re-derives it (tests/small runs).
    Equivalence law (pinned in tests): result == substring_dup_pairs
    over corpus+batch, restricted to pairs with >= 1 batch id."""
    nb = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    cb = corpus_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    if corpus_index is None:
        corpus_index = winnow_fingerprint_index(
            cb, min_tokens=min_tokens, k=k, id_col="id", text_col="text"
        )
    # the batch index feeds three subplans (vs-index join + both sides of
    # the self-join); persist so the Arrow stage runs once per batch, the
    # same transient-persist choice as minhash_lsh_pairs_incremental
    new_idx = winnow_fingerprint_index(
        nb, min_tokens=min_tokens, k=k, id_col="id", text_col="text"
    ).persist()
    n, i = new_idx.alias("n"), corpus_index.alias("i")
    vs_index = n.join(i, "fp").select(
        F.least("n.id", "i.id").alias("ida"),
        F.greatest("n.id", "i.id").alias("idb"),
    )
    a, b = new_idx.alias("a"), new_idx.alias("b")
    vs_self = (
        a.join(b, "fp")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
    )
    cand = vs_index.unionAll(vs_self).distinct()
    docs_all = nb.unionByName(cb)
    cand_ids = cand.select(F.col("ida").alias("id")).union(
        cand.select("idb")
    ).distinct()
    grams = docs_all.join(cand_ids, "id", "left_semi").select(
        "id", token_ngrams(F.col("text"), min_tokens).alias("g")
    )
    return (
        cand.join(
            grams.select(F.col("id").alias("ida"), F.col("g").alias("ga")),
            "ida",
        )
        .join(
            grams.select(F.col("id").alias("idb"), F.col("g").alias("gb")),
            "idb",
        )
        .select(
            "ida",
            "idb",
            F.size(F.array_intersect("ga", "gb")).alias("n_shared"),
        )
        .where(F.col("n_shared") > 0)
    )
