"""Property-based tests (hypothesis) for the reconciliation laws and the
null/sentinel invariants (SURVEY.md §5 items 3-4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.casts import cast_columns
from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.enrich import enrich_descriptor_uri
from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.relational import reconcile_snapshot

_keys = st.sets(st.integers(0, 20), max_size=12)


@settings(max_examples=15, deadline=None)
@given(src=_keys, rem=_keys)
def test_reconcile_partition_law(spark, src, rem):
    """deletes == remote \\ source; upserts == source; and the two never
    overlap on keys (R21 left_anti law), for arbitrary key sets."""
    source = spark.createDataFrame([(str(k),) for k in src] or [], "k string")
    remote = spark.createDataFrame([(str(k), f"rid-{k}") for k in rem] or [], "k string, rid string")
    upserts, deletes = reconcile_snapshot(source, remote, "k")
    up_keys = {r.k for r in upserts.collect()}
    del_keys = {r.k for r in deletes.collect()}
    assert up_keys == {str(k) for k in src}
    assert del_keys == {str(k) for k in rem - src}
    assert not (up_keys & del_keys)


@settings(max_examples=15, deadline=None)
@given(src=_keys, rem=_keys)
def test_reconcile_idempotence(spark, src, rem):
    """After applying a run (remote' = source), a second run deletes
    nothing and upserts the same set."""
    source = spark.createDataFrame([(str(k),) for k in src] or [], "k string")
    remote2 = source.withColumn("rid", F.concat(F.lit("rid-"), "k"))
    _, deletes2 = reconcile_snapshot(source, remote2, "k")
    assert deletes2.count() == 0


_maybe_null_code = st.lists(
    st.one_of(st.none(), st.sampled_from(["M", "F", "X", "zz", "[null]"])),
    min_size=0,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(codes=_maybe_null_code)
def test_enrichment_never_emits_sentinel_and_preserves_nulls(spark, codes):
    """R5/R10 null paths: SQL NULL stays NULL (never the reference's
    "[null]" sentinel), known codes get namespaced URIs, unknown codes pass
    through bare."""
    df = spark.createDataFrame([(i, c) for i, c in enumerate(codes)] or [], "i long, code string")
    vocab = spark.createDataFrame(
        [("M", "uri://ns"), ("F", "uri://ns")], "codeValue string, namespace string"
    )
    out = {r.i: r.uri for r in enrich_descriptor_uri(
        df, vocab, code_col="code", out_col="uri"
    ).collect()}
    for i, c in enumerate(codes):
        if c is None:
            assert out[i] is None
        elif c in ("M", "F"):
            assert out[i] == f"uri://ns#{c}"
        else:
            assert out[i] == c  # bare passthrough, including the literal "[null]" STRING
        assert out[i] != "[null]" or c == "[null]"


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["[null]", "2021-03-05", "1999-12-31"])),
        max_size=10,
    )
)
def test_cast_scrubs_sentinel_to_null(spark, vals):
    """The "[null]" sentinel (Dao.java:65) becomes real NULL before casting;
    valid ISO dates parse; NULLs stay NULL (lenient mode)."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)] or [], "i long, d string")
    out = {r.i: r.d for r in cast_columns(df, {"d": "date"}, strict=False).collect()}
    for i, v in enumerate(vals):
        if v is None or v == "[null]":
            assert out[i] is None
        else:
            assert str(out[i]) == v


# ----------------------------------------------------- connected components

_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=14,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress: label = min reachable node
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None)
@given(edges=_edges)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation on DataFrames == driver-side union-find for
    arbitrary small graphs (self-loops, duplicate and reversed edges,
    multiple components, chains)."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "ida long, idb long")
    got = {r["node"]: r["cluster"] for r in connected_components(df).collect()}
    want = _uf_components([e for e in edges if e[0] != e[1]])
    assert got == want
