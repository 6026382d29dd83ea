"""Offset-insensitive exact-substring dedup (operators/substring.py):
winnowing guarantee, brute-force equivalence, the q92-misses-shifted-
plants law, and the fp_cap guard."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
    gram_hashes,
    substring_dup_pairs,
    token_ngrams,
    window_minima,
    winnow_fingerprint_index,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_docs(seed: int, n_docs: int, lo: int = 5, hi: int = 40):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi))))
        for i in range(n_docs)
    ]


def _brute_pairs(docs, n):
    """Ground truth: pairs sharing >= 1 common n-token gram (== sharing a
    verbatim run of >= n tokens), with the shared distinct-gram count."""
    gram_sets = {}
    for i, text in docs:
        toks = text.split(" ")
        gram_sets[i] = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }
    out = {}
    ids = sorted(gram_sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            shared = gram_sets[ids[ai]] & gram_sets[ids[bi]]
            if shared:
                out[(ids[ai], ids[bi])] = len(shared)
    return out


def _plant(docs, passage, placements):
    """Insert `passage` (token string) into chosen docs at given token
    offsets: placements = {doc_id: offset}."""
    out = []
    for i, text in docs:
        if i in placements:
            toks = text.split(" ")
            off = min(placements[i], len(toks))
            toks[off:off] = passage.split(" ")
            text = " ".join(toks)
        out.append((i, text))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_substring_pairs_equal_bruteforce(spark, seed):
    """The full pipeline (winnow -> inverted-index join -> exact verify)
    must equal brute-force shared-n-gram pairs, including n_shared, for
    random corpora with planted shared runs at arbitrary alignments."""
    n, k = 6, 3
    docs = _mk_docs(seed, 24)
    rng = random.Random(100 + seed)
    passage = " ".join(rng.choice(VOCAB) for _ in range(n + rng.randint(0, 4)))
    docs = _plant(
        docs, passage,
        {2: 0, 7: 3, 11: 9, 15: 1},  # same passage, four alignments
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.ida, r.idb): r.n_shared
        for r in substring_dup_pairs(
            df, min_tokens=n, k=k, id_col="doc_id", text_col="text"
        ).collect()
    }
    want = _brute_pairs(docs, n)
    assert got == want
    # the planted docs must all pair up
    for a, b in [(2, 7), (2, 11), (7, 15), (11, 15)]:
        assert (a, b) in got


def test_winnowing_guarantee_no_candidate_misses(spark):
    """SIGMOD'03 theorem, pinned end-to-end: for EVERY pair sharing a
    verbatim >= N-token run, the two docs share at least one winnowing
    fingerprint (candidate generation can never miss; verification only
    removes hash-collision false positives)."""
    n, k = 8, 4
    docs = _mk_docs(11, 30, lo=10, hi=50)
    passage = " ".join(random.Random(0).choice(VOCAB) for _ in range(n))
    docs = _plant(docs, passage, {1: 5, 4: 0, 9: 14, 20: 2})
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = winnow_fingerprint_index(
        df, min_tokens=n, k=k, id_col="doc_id", text_col="text"
    )
    fp_sets = {}
    for r in idx.collect():
        fp_sets.setdefault(r.id, set()).add(r.fp)
    for (a, b) in _brute_pairs(docs, n):
        assert fp_sets.get(a, set()) & fp_sets.get(b, set()), (a, b)


def test_winnowing_density_below_full_index(spark):
    """Winnowing must SELECT a strict subset: index rows well under the
    total gram count (expected density ~2/(w+1)), while every doc with
    >= min_tokens tokens still contributes >= 1 fingerprint."""
    docs = _mk_docs(5, 40, lo=30, hi=90)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n, k = 24, 8
    idx = winnow_fingerprint_index(
        df, min_tokens=n, k=k, id_col="doc_id", text_col="text"
    )
    per_doc = {
        r["id"]: r["nf"]
        for r in idx.groupBy("id").agg(F.count("*").alias("nf")).collect()
    }
    total_grams = sum(
        len(t.split(" ")) - k + 1 for _, t in docs if len(t.split(" ")) >= n
    )
    assert sum(per_doc.values()) < 0.6 * total_grams
    for i, t in docs:
        if len(t.split(" ")) >= n:
            assert per_doc.get(i, 0) >= 1


def test_shifted_plant_found_here_missed_by_fixed_segments(spark):
    """The round-6 verdict's motivating law: a >= 16-token passage
    duplicated across two docs at DIFFERENT token offsets shares NO
    fixed 16-token-aligned segment (q92's granularity), but
    substring_dup_pairs finds the pair."""
    seg = 16
    passage = " ".join(f"p{i}" for i in range(20))  # unique 20-token run
    filler_a = " ".join(["fa"] * 3)   # plant at offset 3 in doc 0
    filler_b = " ".join(["fb"] * 10)  # plant at offset 10 in doc 1
    docs = [
        (0, f"{filler_a} {passage} tail0 tail1"),
        (1, f"{filler_b} {passage} end0"),
        (2, "unrelated " * 30),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # q92's machinery: non-overlapping seg-aligned md5 segments
    def fixed_segments(text):
        toks = text.split(" ")
        return {
            " ".join(toks[s : s + seg])
            for s in range(0, len(toks), seg)
            if len(toks[s : s + seg]) == seg
        }

    assert not (fixed_segments(docs[0][1]) & fixed_segments(docs[1][1]))

    got = {
        (r.ida, r.idb)
        for r in substring_dup_pairs(
            df, min_tokens=seg, k=8, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert (0, 1) in got
    assert not any(2 in p for p in got)


def test_fp_cap_drops_corpus_wide_boilerplate(spark):
    """With fp_cap, a passage shared by MORE than fp_cap docs stops
    generating pairs (the license-header guard), while rarer shared
    passages are unaffected."""
    boiler = " ".join(f"b{i}" for i in range(12))
    rare = " ".join(f"r{i}" for i in range(12))
    docs = [(i, f"{'x' + str(i) + ' '} {boiler}") for i in range(6)] + [
        (10, f"start {rare}"),
        (11, f"other lead-in {rare}"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kw = dict(min_tokens=10, k=4, id_col="doc_id", text_col="text")
    uncapped = {
        (r.ida, r.idb) for r in substring_dup_pairs(df, **kw).collect()
    }
    capped = {
        (r.ida, r.idb)
        for r in substring_dup_pairs(df, fp_cap=3, **kw).collect()
    }
    assert (10, 11) in uncapped and (10, 11) in capped
    assert any(a < 6 and b < 6 for a, b in uncapped)
    assert not any(a < 6 and b < 6 for a, b in capped)


def test_jvm_helpers_match_python_reference(spark):
    """gram_hashes / window_minima / token_ngrams (the expression-level
    helpers) agree with a plain-Python replay on materialized arrays —
    they remain the composable JVM form even though the index's hot path
    is the vectorized mapInPandas."""
    texts = [
        "a b c d e f g h i",
        "a b c",                # shorter than k -> empty grams
        "x y z x y z x y z x",  # repeats -> distinct minima collapse
    ]
    k, w, n = 3, 4, 6
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    rows = (
        df.select(
            "i",
            gram_hashes(F.col("t"), k).alias("g"),
            token_ngrams(F.col("t"), n).alias("ng"),
        )
        .select("i", "g", "ng", window_minima(F.col("g"), w).alias("m"))
        .collect()
    )
    for r in rows:
        toks = texts[r.i].split(" ")
        n_g = max(len(toks) - k + 1, 0)
        assert len(r.g) == n_g
        # python replay of the window minima over the JVM hash values
        if n_g >= w:
            want = []
            for j in range(n_g - w + 1):
                m = min(r.g[j : j + w])
                if m not in want:
                    want.append(m)
            assert r.m == want
        else:
            assert r.m == []
        want_ng = []
        for j in range(max(len(toks) - n + 1, 0)):
            s = " ".join(toks[j : j + n])
            if s not in want_ng:
                want_ng.append(s)
        assert r.ng == want_ng


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="1 <= k < min_tokens"):
        winnow_fingerprint_index(df, min_tokens=4, k=4)


def test_duplicate_spans_cut_list(spark):
    """duplicate_spans: planted cross-doc passage marks the right token
    ranges in BOTH docs, overlapping gram hits merge into one maximal
    span, within-doc repetition self-flags, clean docs emit nothing."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        duplicate_spans,
    )

    n = 4
    passage = "p1 p2 p3 p4 p5"          # 5 tokens -> two overlapping 4-grams
    docs = [
        (0, f"a0 a1 {passage} a2 a3"),   # passage at tokens 3..7
        (1, f"b0 {passage} b1 b2 b3 b4"),  # passage at tokens 2..6
        (2, "c0 c1 c2 c3 c4 c5 c6 c7"),  # clean
        (3, "r1 r2 r3 r4 x y r1 r2 r3 r4"),  # self-repeat: both copies flag
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in duplicate_spans(df, n=n).collect():
        got.setdefault(r.id, []).append((r.s, r.e, r.n_dup_tokens))
    assert got[0] == [(3, 7, 5)]   # one merged maximal span
    assert got[1] == [(2, 6, 5)]
    assert 2 not in got
    # self-repeat: grams r1..r4 (pos 1) and (pos 7) both flagged; gap
    # 7-1=6 > n -> two separate spans
    assert got[3] == [(1, 4, 4), (7, 10, 4)]


def test_cdc_segments_resynchronize_after_shift(spark):
    """The CDC law: doc B = pad + doc A must share (almost all of) A's
    segments — boundaries depend only on local content, so after B's
    first boundary past the pad, segmentation re-synchronizes with A's.
    q92-style FIXED 16-token alignment shares nothing under the same
    shift (pinned in test_shifted_plant_found_here_missed_by_fixed_
    segments)."""
    import random

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        cdc_segments,
    )

    rng = random.Random(7)
    body = " ".join(rng.choice(VOCAB) for _ in range(120))
    docs = [
        (0, body),
        (1, "shift1 " + body),          # 1-token shift
        (2, "p1 p2 p3 p4 p5 " + body),  # 5-token shift
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    segs = {}
    for r in cdc_segments(df, k=4).collect():
        segs.setdefault(r.id, set()).add(r.seg_digest)
    # the unshifted doc has multiple segments (boundary density 1/16)
    assert len(segs[0]) >= 3
    # each shifted copy shares all of A's segments except at most the
    # first (the one the pad bleeds into)
    for other in (1, 2):
        shared = segs[0] & segs[other]
        assert len(shared) >= len(segs[0]) - 1, (other, len(shared), len(segs[0]))


def test_cdc_segments_cover_every_token_once(spark):
    """Partition law: segment token counts sum to the doc's token count
    (every token in exactly one segment)."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        cdc_segments,
    )

    docs = _mk_docs(21, 12, lo=1, hi=60)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_segments(df, k=4).collect():
        got[r.id] = got.get(r.id, 0) + r.n_tok
    for i, t in docs:
        assert got[i] == len(t.split(" ")), i


def test_remove_spans_cut_and_stitch(spark):
    """remove_spans: cut tokens inside spans, keep order, pass through
    span-free docs, drop docs whose every token is cut."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        remove_spans,
    )

    docs = [
        (0, "a b c d e f g h"),
        (1, "x y z"),
        (2, "q r s t"),
    ]
    spans = [
        (0, 3, 5),   # cut c d e
        (0, 8, 8),   # cut h (two spans, one doc)
        (2, 1, 4),   # cut everything
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sp = spark.createDataFrame(spans, "id long, s long, e long")
    got = {r.id: (r.n_kept, r.clean_text) for r in remove_spans(d, sp).collect()}
    assert got[0] == (4, "a b f g")
    assert got[1] == (3, "x y z")      # no spans -> untouched
    assert 2 not in got                # fully duplicated doc disappears


def test_incremental_equals_full_restricted_to_batch(spark):
    """The incremental contract's equivalence law: batch-vs-stored-index
    pairs == the FULL substring_dup_pairs over corpus+batch, restricted
    to pairs touching a batch id — including shifted cross-alignment
    plants and batch-internal duplicates."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.substring import (
        substring_dup_pairs,
        substring_dup_pairs_incremental,
        winnow_fingerprint_index,
    )

    n, k = 6, 3
    corpus = _mk_docs(31, 20, lo=8, hi=30)
    passage = " ".join(random.Random(5).choice(VOCAB) for _ in range(n + 2))
    corpus = _plant(corpus, passage, {3: 2, 8: 0})
    batch = [
        (100, "lead " + passage),            # batch-vs-corpus at new offset
        (101, passage + " trail tail"),      # batch-vs-batch too
        (102, " ".join(["noise"] * 12)),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    idx = winnow_fingerprint_index(
        cdf, min_tokens=n, k=k, id_col="doc_id", text_col="text"
    )
    inc = {
        (r.ida, r.idb): r.n_shared
        for r in substring_dup_pairs_incremental(
            bdf, cdf, corpus_index=idx, min_tokens=n, k=k
        ).collect()
    }
    batch_ids = {i for i, _ in batch}
    full = {
        (r.ida, r.idb): r.n_shared
        for r in substring_dup_pairs(
            cdf.unionByName(bdf), min_tokens=n, k=k
        ).collect()
        if r.ida in batch_ids or r.idb in batch_ids
    }
    assert inc == full
    assert any(a == 100 or b == 100 for a, b in inc)   # cross pair found
    assert (100, 101) in inc                            # batch-internal
