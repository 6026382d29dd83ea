"""End-to-end application test (app.py): the reference's full deployable —
properties file + sql/columnmap input dir + RDBMS + REST API — run as one
distributed job against embedded Derby and the REST stub. Covers config
parsing, spec loading, JDBC scan, rename/cast/last-row-wins/nest, JSON
serialization, REST upserts, snapshot-delete reconciliation, and the
report file (R1-R26 wired together the way a reference user runs them)."""

from __future__ import annotations

import glob
import os

from ed_fi_x_tpdm_data_ingestion_poc_spark.app import (
    AppConfig,
    parse_properties,
    run,
    teacher_candidate_builder,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.testing.rest_stub import StubRestServer


def _write_inputs(tmp_path, derby_url):
    sql_dir = tmp_path / "input" / "sql"
    map_dir = tmp_path / "input" / "columnmap"
    sql_dir.mkdir(parents=True)
    map_dir.mkdir(parents=True)
    # physical Banner-ish table, queried by the shipped-SQL analog
    # literal descriptor columns, as the reference's shipped SQL does
    # (runtime/input/sql/teacherCandidate.sql:7-10)
    (sql_dir / "teacherCandidate.sql").write_text(
        "SELECT SPRIDEN_ID, SPRIDEN_FIRST_NAME,\n"
        "       SPRIDEN_LAST_NAME, SRC_ORDER,\n"
        "       'Bilingual' AS ACADEMIC_SUBJECT,\n"
        "       'Postsecondary' AS GRADE_LEVEL,\n"
        "       'BIS' AS DEGREE_TYPE\n"
        "FROM cand_src\n"
    )
    (map_dir / "teacherCandidate.map").write_text(
        "teacherCandidateIdentifier=SPRIDEN_ID\n"
        "firstName=SPRIDEN_FIRST_NAME\n"
        "lastSurname=SPRIDEN_LAST_NAME\n"
        "sourceOrder=SRC_ORDER\n"
        "academicSubjectDescriptor=ACADEMIC_SUBJECT\n"
        "gradeLevelDescriptor=GRADE_LEVEL\n"
        "tppDegreeTypeDescriptor=DEGREE_TYPE\n"
    )
    return tmp_path


def test_full_app_run(spark, tmp_path):
    # --- the "remote RDBMS": embedded Derby with the physical table
    derby_url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.createDataFrame(
        [
            ("101", "Ana", "Alvarez", 1),
            ("101", "Ana", "Alvarez-Smith", 2),  # last-row-wins
            ("102", "Ben", "Baker", 1),
        ],
        "SPRIDEN_ID string, SPRIDEN_FIRST_NAME string,"
        " SPRIDEN_LAST_NAME string, SRC_ORDER int",
    )
    src.write.jdbc(derby_url, "cand_src", mode="overwrite", properties=props)
    _write_inputs(tmp_path, derby_url)

    # the same stub serves the descriptor list endpoints (GET pages) and
    # the data sink (POST/DELETE)
    vocab_rows = [
        {"codeValue": "Bilingual", "namespace": "uri://tpdm/AcademicSubject"}
    ]
    with StubRestServer(vocab_rows, require_auth=True) as server:
        cfg = AppConfig(
            {
                "database.url": derby_url,
                "database.driver": "org.apache.derby.jdbc.EmbeddedDriver",
                "input.sql.dir": str(tmp_path / "input" / "sql"),
                "input.columnmap.dir": str(tmp_path / "input" / "columnmap"),
                "output.dir": str(tmp_path / "output"),
                "oauth.token.url": server.token_url,
                "oauth.client.id": "cid",
                "oauth.client.secret": "secret",
                "api.base.path": server.url,
                "tpdm.api.save": "true",
                "output.data.to.dir": "true",
            }
        )
        # vocabularies over the paginated REST source (R10 + R16)
        from ed_fi_x_tpdm_data_ingestion_poc_spark.app import (
            load_descriptor_vocabularies,
        )

        vocabs = load_descriptor_vocabularies(
            spark, server.url, ["academicSubject"], auth=cfg.oauth()
        )
        # remote snapshot: 101 exists, ghost-9 must be deleted (R21)
        remote = spark.createDataFrame(
            [("101", "res-101"), ("ghost-9", "res-ghost")],
            "teacherCandidateIdentifier string, resource_id string",
        )
        report = run(
            cfg,
            teacher_candidate_builder(vocabs),
            spark=spark,
            remote_snapshot=remote,
        )

        # report: 2 upserts (101 deduped by last-row-wins, 102), 1 delete
        assert report.upsert_count == 2
        assert report.delete_count == 1
        assert report.error_count == 0 and not report.fatal_error

        # the stub actually received them
        assert len(server.upserts) == 2
        names = {d["lastSurname"] for d in server.upserts}
        assert names == {"Alvarez-Smith", "Baker"}  # last row won
        # vocabulary enrichment applied (R10: namespace#code URI)
        subjects = {d["academicSubjectDescriptor"] for d in server.upserts}
        assert subjects == {"uri://tpdm/AcademicSubject#Bilingual"}
        assert server.deletes == ["res-ghost"]

    # artifacts on disk: JSON documents + a .report file
    out = str(tmp_path / "output")
    assert glob.glob(os.path.join(out, "documents", "*", "*.json"))
    reports = glob.glob(os.path.join(out, "*.report"))
    assert len(reports) == 1
    text = open(reports[0]).read()
    assert "Upsert count: 2" in text and "Delete count: 1" in text


def test_dry_run_and_properties_parsing(spark, tmp_path):
    derby_url = f"jdbc:derby:{tmp_path}/db2;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    spark.createDataFrame(
        [("201", "Cam", "Cole", 1)],
        "SPRIDEN_ID string, SPRIDEN_FIRST_NAME string,"
        " SPRIDEN_LAST_NAME string, SRC_ORDER int",
    ).write.jdbc(derby_url, "cand_src", mode="overwrite", properties=props)
    _write_inputs(tmp_path, derby_url)

    pfile = tmp_path / "application.properties"
    pfile.write_text(
        "# comment\n"
        f"database.url={derby_url}\n"
        "database.driver=org.apache.derby.jdbc.EmbeddedDriver\n"
        f"input.sql.dir={tmp_path}/input/sql\n"
        f"output.dir={tmp_path}/out2\n"
        "tpdm.api.save=false\n"
    )
    assert parse_properties(str(pfile))["tpdm.api.save"] == "false"

    report = run(
        AppConfig.from_file(str(pfile)), teacher_candidate_builder(), spark=spark
    )
    assert report.upsert_count == 0 and report.delete_count == 0
    assert any("dry run: 1 documents" in e for e in report.errors)
    assert glob.glob(os.path.join(str(tmp_path / "out2"), "*.report"))


def test_cli_main_dry_run(spark, tmp_path, capsys):
    """python -m ed_fi_x_tpdm_data_ingestion_poc_spark <props> (run.sh
    analog): exit 0 and a rendered report on stdout."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.app import main

    derby_url = f"jdbc:derby:{tmp_path}/db3;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    spark.createDataFrame(
        [("301", "Dee", "Dunn", 1)],
        "SPRIDEN_ID string, SPRIDEN_FIRST_NAME string,"
        " SPRIDEN_LAST_NAME string, SRC_ORDER int",
    ).write.jdbc(derby_url, "cand_src", mode="overwrite", properties=props)
    _write_inputs(tmp_path, derby_url)
    pfile = tmp_path / "application.properties"
    pfile.write_text(
        f"database.url={derby_url}\n"
        "database.driver=org.apache.derby.jdbc.EmbeddedDriver\n"
        f"input.sql.dir={tmp_path}/input/sql\n"
        f"output.dir={tmp_path}/out3\n"
        "tpdm.api.save=false\n"
    )
    assert main([str(pfile)]) == 0
    out = capsys.readouterr().out
    assert "Upsert count: 0" in out
    assert main([]) == 2  # usage error
