"""strip_html extraction laws (operators/text.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.text import strip_html

CASES = [
    # (html, expected)
    ('<html><head><title>T</title><style>p { c: r; }</style>'
     '<script type="x">var a = 1 < 2; s("hi");</script></head>'
     '<body><!-- c --><div class="m"><p>hello world</p><br/>'
     '&amp;lt; &quot;q&#39;s&quot; &nbsp;end</div></body></html>',
     'T hello world &lt; "q\'s" end'),
    ("<p>a</p><p>b</p>", "a b"),                    # tag -> token boundary
    ("no markup at all", "no markup at all"),
    ("<SCRIPT>bad()</SCRIPT>tail", "tail"),         # case-insensitive
    ("<script>unclosed content", "unclosed content"),  # lenient unclosed
    ("<style a=b>x{y}</style >after", "after"),     # attrs + spaced close
    ("a\n\n  b\tc", "a b c"),                       # whitespace collapse
    ("&amp;amp;", "&amp;"),                         # no double-decode
]


def test_strip_html_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "i long, h string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", strip_html(F.col("h")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


def test_strip_html_idempotent_on_plain_text(spark):
    """Stripping already-clean text is the identity (entities excepted by
    design — they decode once); so the op can sit unconditionally in an
    ingest pipeline."""
    texts = ["plain text", "a b c", "1 < 2 is math not markup"[:5]]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {
        r.i: r.c
        for r in df.select(
            "i", strip_html(strip_html(F.col("t"))).alias("c")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t


def test_strip_html_random_wrappers_recover_text(spark):
    """Property: for arbitrary compositions of the supported wrapper
    constructs (tags with attrs, script/style blocks, comments, entity
    whitespace) around entity-free body text, stripping recovers exactly
    the body."""
    import random

    rng = random.Random(13)
    tags = ["div", "p", "span", "td", "article"]
    rows = []
    for i in range(40):
        body = " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"])
            for _ in range(rng.randint(1, 12))
        )
        t = rng.choice(tags)
        pieces = [f'<{t} class="c{i}">', body, f"</{t}>"]
        if rng.random() < 0.5:
            pieces.insert(0, f"<script>var v={i} < {i+1};</script>")
        if rng.random() < 0.5:
            pieces.insert(0, "<style>a{x:y}</style>")
        if rng.random() < 0.5:
            pieces.append(f"<!-- trailing {i} -->")
        if rng.random() < 0.5:
            pieces.append("&nbsp;")
        rows.append((i, "".join(pieces), body))
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in rows], "i long, h string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", strip_html(F.col("h")).alias("c")).collect()
    }
    for i, _, body in rows:
        assert got[i] == body, i
