"""Published web-corpus filter rule sets (operators/text.py): Gopher
document-quality flags and C4 line-level cleaning — exercising the
line-structure paths (bullets, ellipses, multi-line pages) the synthetic
single-line corpus never hits."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.text import (
    c4_clean_lines,
    c4_page_keep,
    gopher_flags,
)


def _flags(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_flags("text").alias("g")).select("g.*").collect()[0]


def test_gopher_passes_clean_document(spark):
    text = " ".join(["the quick brown fox jumps over a lazy dog and"] * 6)
    r = _flags(spark, text)
    assert (r.words, r.word_len, r.symbols, r.bullets, r.ellipses,
            r.alpha, r.stopwords, r.keep) == (1, 1, 1, 1, 1, 1, 1, 1)


def test_gopher_word_count_bounds(spark):
    assert _flags(spark, "too short").words == 0
    assert _flags(spark, " ".join(["w"] * 50)).words == 1


def test_gopher_bullet_and_ellipsis_lines(spark):
    base = "the cat sat and it was good here now"
    bullets = "\n".join(f"- {base}" for _ in range(10))
    r = _flags(spark, bullets + "\n" + " ".join([base] * 5))
    # 10 of 11 lines bulleted -> 0.909 > 0.9 cap
    assert r.bullets == 0
    dots = "\n".join(f"{base}..." for _ in range(4))
    r2 = _flags(spark, dots + "\n" + " ".join([base] * 5))
    # 4 of 5 lines end in ellipsis -> 0.8 > 0.3 cap (4 '...' tokens over
    # ~65 words stays under the 0.1 symbol cap, so only this rule fires)
    assert r2.ellipses == 0 and r2.symbols == 1
    dense = " ".join(["a#b"] * 10 + ["the cat sat it is here now on mat"] * 6)
    assert _flags(spark, dense).symbols == 0


def test_gopher_alpha_and_stopword_rules(spark):
    digits = " ".join(str(i) for i in range(60))
    r = _flags(spark, digits)
    assert r.alpha == 0 and r.stopwords == 0 and r.keep == 0


def _c4(spark, page):
    df = spark.createDataFrame([(page,)], "page string")
    kept = c4_clean_lines("page")
    return df.select(
        F.array_join(kept, "\n").alias("clean"),
        c4_page_keep("page", kept).cast("int").alias("keep"),
    ).collect()[0]


def test_c4_keeps_only_terminal_punct_lines(spark):
    page = "the cat sat on the mat.\nno terminal punctuation here\n" \
           "is this a question with words?\nshort one.\nthe dog ran far away!"
    r = _c4(spark, page)
    assert r.clean.split("\n") == [
        "the cat sat on the mat.",
        "is this a question with words?",
        "the dog ran far away!",
    ]
    assert r.keep == 1  # 3 kept lines, no poison


def test_c4_drops_javascript_lines_and_short_lines(spark):
    page = "please enable javascript to continue viewing.\nhi there."
    r = _c4(spark, page)
    assert r.clean == "" and r.keep == 0


def test_c4_page_poison(spark):
    good = "the cat sat on the mat."
    lorem = "\n".join([good] * 3) + "\nLorem Ipsum dolor sit amet."
    assert _c4(spark, lorem).keep == 0
    code = "\n".join([good] * 3) + "\nif (x) { return; }"
    assert _c4(spark, code).keep == 0
    assert _c4(spark, "\n".join([good] * 3)).keep == 1


def test_c4_quote_terminal_counts(spark):
    page = 'he said "the cat sat there."\nshe replied "yes it did run."'
    r = _c4(spark, page)
    assert len(r.clean.split("\n")) == 2
