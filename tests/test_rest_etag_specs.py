"""R20 etag semantics (PUT If-Match, GET If-None-Match) and the R7 spec
loader (.sql + .map directories)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.sinks.rest_sink import RestSink, rest_update
from ed_fi_x_tpdm_data_ingestion_poc_spark.sources.rest import RestSource, get_by_id
from ed_fi_x_tpdm_data_ingestion_poc_spark.sources.specs import load_spec
from ed_fi_x_tpdm_data_ingestion_poc_spark.testing.rest_stub import StubRestServer


def test_put_if_match_conflict_recorded(spark):
    with StubRestServer([]) as server:
        server.store["r1"] = ({"v": 1}, 3)
        server.store["r2"] = ({"v": 2}, 7)
        sink = RestSink(base_url=server.url, path="/items")
        docs = spark.createDataFrame(
            [("r1", '{"v":10}', "3"), ("r2", '{"v":20}', "6")],  # r2 etag stale
            "rid string, body string, etag string",
        )
        out = {r.key: r for r in rest_update(
            docs, sink, id_col="rid", json_col="body", etag_col="etag"
        ).collect()}
        assert out["r1"].ok and out["r1"].status == 204
        assert not out["r2"].ok and out["r2"].status == 412
        assert server.store["r1"] == ({"v": 10}, 4)  # updated + version bump
        assert server.store["r2"] == ({"v": 2}, 7)  # conflict left untouched


def test_get_by_id_conditional(spark):
    with StubRestServer([]) as server:
        server.store["r9"] = ({"name": "doc"}, 5)
        src = RestSource(base_url=server.url, path="/items")
        status, doc, etag = get_by_id(src, "r9")
        assert (status, doc, etag) == (200, {"name": "doc"}, "5")
        status2, doc2, etag2 = get_by_id(src, "r9", etag=etag)
        assert (status2, doc2, etag2) == (304, None, "5")  # cached copy current
        status3, _, _ = get_by_id(src, "r9", etag="4")
        assert status3 == 200  # stale etag -> full body


def test_spec_loader_sql_and_maps():
    base = tempfile.mkdtemp(prefix="spec-")
    os.makedirs(os.path.join(base, "sql"))
    os.makedirs(os.path.join(base, "columnmap"))
    with open(os.path.join(base, "sql", "ids.sql"), "w") as f:
        f.write("SELECT a,\n       b\nFROM t\nWHERE x = 1\n")
    with open(os.path.join(base, "columnmap", "ids.map"), "w") as f:
        f.write("logicalA=PHYS_A\nlogicalB=PHYS_B\n")
    spec = load_spec(base)
    # readSql semantics: lines joined with single spaces (R7)
    assert spec.sql == {"ids": "SELECT a, b FROM t WHERE x = 1"}
    assert spec.column_maps == {"ids": {"logicalA": "PHYS_A", "logicalB": "PHYS_B"}}
