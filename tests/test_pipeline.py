"""Golden end-to-end pipeline test (SURVEY.md §5 item 2): Banner-shaped
fixtures -> build_documents -> nested JSON docs with exact expected shape,
covering R4–R15, R21, R23 (last-row-wins, dedup/period-merge, enrichment
fallback, nesting, reconciliation, ISO serialization)."""

from __future__ import annotations

import json

import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.casts import cast_columns
from ed_fi_x_tpdm_data_ingestion_poc_spark.pipeline import (
    TeacherCandidatePipeline,
    build_documents,
    plan_sync,
    serialize_documents,
)
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


@pytest.fixture(scope="module")
def docs(spark):
    cands = spark.createDataFrame(
        [
            ("101", "Ana", "Alvarez", "1999-02-03", "F", "ART", "K", "BA", 1),
            ("101", "Ana", "Alvarez-S", "1999-02-03", "F", "ART", "K", "BA", 2),
            ("102", "Ben", "Baker", None, "X", "MATH", "1", "ZZ", 1),
        ],
        "teacherCandidateIdentifier string, firstName string, lastSurname string,"
        " birthDate string, sexDescriptor string, academicSubjectDescriptor string,"
        " gradeLevelDescriptor string, tppDegreeTypeDescriptor string, sourceOrder int",
    )
    addrs = spark.createDataFrame(
        [
            ("101", "MA", "1 Elm St", "Austin", "TX", "78701", "2019-01-01", "2019-12-31", "false"),
            ("101", "MA", "1 Elm St", "Austin", "TX", "78701", "2020-01-01", None, "false"),
            ("101", "MA", "1 Elm St", "Austin", "TX", "78701", "2020-01-01", None, "false"),
        ],
        "teacherCandidateIdentifier string, addressTypeDescriptor string,"
        " streetNumberName string, city string, stateAbbreviationDescriptor string,"
        " postalCode string, beginDate string, endDate string, doNotPublishIndicator string",
    )
    vocabs = {
        name: spark.createDataFrame(rows, "codeValue string, namespace string")
        for name, rows in {
            "sex": [("F", "uri://x/Sex"), ("M", "uri://x/Sex")],
            "academicSubject": [("ART", "uri://x/Subj"), ("MATH", "uri://x/Subj")],
            "gradeLevel": [("K", "uri://x/Grade"), ("1", "uri://x/Grade")],
            "tppDegreeType": [("BA", "uri://x/Degree")],
            "addressType": [("MA", "uri://x/AddrType")],
            "stateAbbreviation": [("TX", "uri://x/State")],
        }.items()
    }
    p = TeacherCandidatePipeline(candidates=cands, addresses=addrs, vocabularies=vocabs)
    return build_documents(p)


def test_last_row_wins_and_nesting(docs):
    rows = {r.teacherCandidateIdentifier: r for r in docs.collect()}
    assert rows["101"].lastSurname == "Alvarez-S"  # R15
    # dedup + period merge (R13): one address, two periods (dup dropped)
    addrs = rows["101"].addresses
    assert len(addrs) == 1
    periods = addrs[0].periods
    assert len(periods) == 2
    assert str(periods[0].beginDate) == "2019-01-01"
    assert periods[1].endDate is None
    # zero-address candidate -> empty array, not null (R14)
    assert rows["102"].addresses == []


def test_enrichment_uri_and_fallback(docs):
    rows = {r.teacherCandidateIdentifier: r for r in docs.collect()}
    assert rows["101"].sexDescriptor == "uri://x/Sex#F"
    assert rows["102"].sexDescriptor == "X"  # miss -> bare code (R10)
    deg = rows["102"].tppProgramDegrees
    assert len(deg) == 1 and deg[0].tppDegreeTypeDescriptor == "ZZ"
    assert rows["101"].studentReference.studentUniqueId == "101"


def test_serialized_docs_iso_dates(docs):
    payloads = {
        r.key: json.loads(r.json) for r in serialize_documents(docs).collect()
    }
    assert payloads["101"]["birthDate"] == "1999-02-03"  # ISO (R23)
    assert payloads["101"]["addresses"][0]["periods"][0]["beginDate"] == "2019-01-01"
    # null scalar omitted by to_json (Gson default omits nulls too)
    assert "birthDate" not in payloads["102"]


def test_plan_sync_reconciliation(docs, spark):
    remote = spark.createDataFrame(
        [("101", "r1"), ("900", "r9")], "teacherCandidateIdentifier string, id string"
    )
    upserts, deletes = plan_sync(docs, remote)
    assert upserts.count() == 2
    assert [r.id for r in deletes.collect()] == ["r9"]  # R21


def test_cast_strict_raises_on_bad_date(spark):
    df = spark.createDataFrame([("oops",)], "birthDate string")
    with pytest.raises(Exception) as ei:
        cast_columns(df, {"birthDate": "date"}, strict=True).collect()
    assert "not a valid date" in str(ei.value)


def test_cast_lenient_nulls_and_sentinel(spark):
    df = spark.createDataFrame(
        [("oops", "[null]"), ("2020-01-01", "true")], "d string, b string"
    )
    out = cast_columns(df, {"d": "date", "b": "boolean"}, strict=False).collect()
    by_b = {str(r.d): r.b for r in out}
    assert by_b == {"None": None, "2020-01-01": True}  # sentinel scrubbed, bad date -> NULL
