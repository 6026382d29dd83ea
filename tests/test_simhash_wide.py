"""Wide (multi-word) SimHash signatures (round-2 verdict ask #6): at 1B
docs, 4-bit band keys (64-bit sig / 16 bands) collide into coarse buckets;
words=2 doubles the signature to 128 bits -> 8-bit bands at the same band
count. Pigeonhole recall (a pair with hamming < bands must agree on at
least one band) must hold over the CONCATENATED bits, and the banded join
must return exactly the brute-force hamming pairs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.dedup import (
    simhash_near_pairs,
    simhash_signatures,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def _brute_pairs(sig_pdf: pd.DataFrame, sig_cols: list[str], max_hamming: int):
    import numpy as np

    ids = sig_pdf["id"].to_numpy()
    sigs = sig_pdf[sig_cols].to_numpy().astype("int64").view("uint64")
    out = set()
    for i in range(len(ids)):
        x = sigs[i] ^ sigs[i + 1 :]
        ham = np.zeros(len(x), dtype="int64")
        for w in range(x.shape[1]):
            v = x[:, w].copy()
            for _ in range(64):
                ham += (v & 1).astype("int64")
                v >>= np.uint64(1)
        for j in np.nonzero(ham <= max_hamming)[0]:
            a, b = ids[i], ids[i + 1 + j]
            out.add((min(a, b), max(a, b)))
    return out


@pytest.mark.parametrize("words,bands", [(1, 16), (2, 16)])
def test_banded_pairs_equal_brute_force(spark, sf_dir, words, bands):
    docs = table(spark, sf_dir, "documents").limit(120)
    sigs = simhash_signatures(docs, words=words).persist()
    sig_cols = ["sh"] + [f"sh{w}" for w in range(1, words)]
    assert sigs.columns == ["id"] + sig_cols

    max_hamming = bands - 2  # < bands: pigeonhole recall guarantee applies
    got = {
        (min(r["ida"], r["idb"]), max(r["ida"], r["idb"]))
        for r in simhash_near_pairs(
            docs, max_hamming=max_hamming, bands=bands, signatures=sigs
        ).collect()
    }
    want = _brute_pairs(sigs.toPandas(), sig_cols, max_hamming)
    assert got == want
    sigs.unpersist()


def test_word_signatures_are_deterministic_and_distinct(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    a = simhash_signatures(docs, words=2).toPandas().set_index("id").sort_index()
    b = simhash_signatures(docs, words=2).toPandas().set_index("id").sort_index()
    pd.testing.assert_frame_equal(a, b)  # deterministic across runs
    # word 0 of a words=2 run is exactly the words=1 signature
    base = simhash_signatures(docs, words=1).toPandas().set_index("id").sort_index()
    assert (a["sh"] == base["sh"]).all()
    # the second word is an independent mix, not a copy
    assert (a["sh"] != a["sh1"]).any()


def test_bands_must_divide_into_words(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(5)
    sigs = simhash_signatures(docs, words=2)
    with pytest.raises(ValueError, match="multiple of words"):
        simhash_near_pairs(docs, bands=15, signatures=sigs)
