"""REST source/sink tests against the in-process ODS stub: full pagination
(fixing the reference's first-page truncation), OAuth token fetch, the
401-refresh-retry pattern (SisConnectorService.java:189-196), sink outcome
accumulation and the run report."""

from __future__ import annotations

from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.report import build_report
from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.rest_sink import (
    RestSink,
    rest_delete,
    rest_upsert,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.sources.rest import (
    OAuthConfig,
    RestSource,
    fetch_token,
    iter_all_rows,
    read_rest,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.testing.rest_stub import StubRestServer
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType([StructField("id", LongType()), StructField("name", StringType())])


def _rows(n):
    return [{"id": i, "name": f"row-{i}"} for i in range(n)]


def test_pagination_reads_past_first_page():
    with StubRestServer(_rows(250), page_size_cap=100) as s:
        src = RestSource(base_url=s.url, path="/items", page_size=100)
        got = list(iter_all_rows(src))
    assert len(got) == 250  # reference would stop at 100 (R16 bug fixed)
    assert got[-1]["id"] == 249


def test_read_rest_distributed(spark):
    with StubRestServer(_rows(230), page_size_cap=100) as s:
        src = RestSource(base_url=s.url, path="/items", page_size=100)
        df = read_rest(spark, src, SCHEMA)
        assert df.count() == 230
        assert df.schema == SCHEMA


def test_oauth_token_fetch():
    with StubRestServer([], require_auth=True) as s:
        tok = fetch_token(OAuthConfig(s.token_url, "client", "secret"))
        assert tok == "tok-1"


def test_source_401_refresh_retry():
    with StubRestServer(_rows(5), fail_first_with_401=True) as s:
        src = RestSource(
            base_url=s.url,
            path="/items",
            page_size=100,
            auth=OAuthConfig(s.token_url, "c", "s"),
        )
        got = list(iter_all_rows(src))  # first call 401s with tok-1, retries with tok-2
    assert len(got) == 5
    assert s.token_requests >= 2


def test_sink_upsert_delete_and_report(spark):
    docs = spark.createDataFrame(
        [("101", '{"a":1}'), ("102", '{"a":2}')], "key string, json string"
    )
    ids = spark.createDataFrame([("r9",)], "id string")
    with StubRestServer([]) as s:
        sink = RestSink(base_url=s.url, path="/tpdm/teacherCandidates")
        outcomes = rest_upsert(docs, sink, key_col="key", json_col="json").unionAll(
            rest_delete(ids, sink, id_col="id")
        )
        report = build_report(outcomes)
        assert sorted(u["a"] for u in s.upserts) == [1, 2]
        assert s.deletes == ["r9"]
    assert report.upsert_count == 2
    assert report.delete_count == 1
    assert report.error_count == 0
    assert "Upsert count: 2" in report.render()


def test_sink_errors_recorded_not_fatal(spark):
    docs = spark.createDataFrame([("101", '{"a":1}')], "key string, json string")
    # point the sink at a closed port -> connection error recorded in outcomes
    sink = RestSink(base_url="http://127.0.0.1:9", path="/x", timeout_sec=0.5)
    report = build_report(rest_upsert(docs, sink, key_col="key", json_col="json"))
    assert report.upsert_count == 0
    assert report.error_count == 1
    assert report.errors and "upsert 101" in report.errors[0]
