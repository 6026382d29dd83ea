"""Teacher-candidate ingestion pipeline — the reference's end-to-end flow
(SURVEY.md §3 entry point 1) as one declarative DataFrame graph.

Reference call sequence re-expressed (/root/reference/banner-connector/src/
main/java/org/edfi/sis/service/SisConnectorService.java:83-160):

  ids query          -> driving-id DataFrame                  (R4)
  per-id detail loop -> join + last-row-wins                  (R2+R15)
  column maps        -> rename_columns                        (R5/R6)
  string->typed      -> cast_columns                          (R8/R9)
  descriptor maps    -> enrich_descriptor_uri (broadcast)     (R10)
  address dedup      -> dedupe_merge_periods                  (R13)
  doc assembly       -> build_struct + nest_children          (R11-R14)
  snapshot diff      -> reconcile_snapshot (left_anti)        (R21)
  Gson serialization -> F.to_json (ISO dates)                 (R23)

The reference runs this one candidate at a time on one thread with 2 JDBC
round-trips per candidate; here every stage is a set-level transform, so the
same graph runs on any number of executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.casts import cast_columns
from .operators.enrich import enrich_descriptor_uri
from .operators.nest import dedupe_merge_periods, nest_children
from .operators.relational import latest_per_key, reconcile_snapshot
from .operators.rename import rename_columns


@dataclass
class TeacherCandidatePipeline:
    """Inputs are already-loaded DataFrames (from JDBC, parquet, or REST) —
    the pipeline itself is source-agnostic, like the reference's SQL-file
    indirection."""

    candidates: DataFrame  # detail rows (possibly many per id)
    addresses: DataFrame  # address rows (0..n per id)
    vocabularies: dict[str, DataFrame]  # descriptor name -> (codeValue, namespace)
    candidate_map: dict[str, str] = field(default_factory=dict)
    address_map: dict[str, str] = field(default_factory=dict)
    id_col: str = "teacherCandidateIdentifier"
    order_col: str = "sourceOrder"  # last-row-wins ordering (R15)
    strict: bool = True


def build_documents(p: TeacherCandidatePipeline) -> DataFrame:
    """Produce one nested document row per candidate id.

    Output columns: the candidate scalars (enriched), plus
    `tppProgramDegrees` (array<struct>, single element — the reference
    always builds exactly one, SisConnectorService.java:421-431),
    `studentReference` struct, and `addresses` array<struct> with merged
    `periods`.
    """
    cand = p.candidates
    if p.candidate_map:
        cand = rename_columns(cand, p.candidate_map, strict=p.strict, keep_unmapped=True)
    cand = cast_columns(cand, {"birthDate": "date"}, strict=p.strict)
    cand = latest_per_key(cand, [p.id_col], [p.order_col])

    for col, vocab_name in [
        ("sexDescriptor", "sex"),
        ("academicSubjectDescriptor", "academicSubject"),
        ("gradeLevelDescriptor", "gradeLevel"),
        ("tppDegreeTypeDescriptor", "tppDegreeType"),
    ]:
        if col in cand.columns and vocab_name in p.vocabularies:
            cand = enrich_descriptor_uri(cand, p.vocabularies[vocab_name], code_col=col)

    # tppProgramDegrees: single-element array of struct (ref :421-431).
    cand = cand.withColumn(
        "tppProgramDegrees",
        F.array(
            F.struct(
                F.col("academicSubjectDescriptor"),
                F.col("gradeLevelDescriptor"),
                F.col("tppDegreeTypeDescriptor"),
            )
        ),
    ).withColumn(
        "studentReference",
        F.struct(F.col(p.id_col).alias("studentUniqueId")),
    )

    addr = p.addresses
    if p.address_map:
        addr = rename_columns(addr, p.address_map, strict=p.strict, keep_unmapped=True)
    addr = cast_columns(
        addr,
        {"beginDate": "date", "endDate": "date", "doNotPublishIndicator": "boolean"},
        strict=p.strict,
    )
    for col, vocab_name in [
        ("addressTypeDescriptor", "addressType"),
        ("stateAbbreviationDescriptor", "stateAbbreviation"),
    ]:
        if col in addr.columns and vocab_name in p.vocabularies:
            addr = enrich_descriptor_uri(addr, p.vocabularies[vocab_name], code_col=col)

    identity = [
        c
        for c in (
            "addressTypeDescriptor",
            "streetNumberName",
            "city",
            "stateAbbreviationDescriptor",
            "postalCode",
        )
        if c in addr.columns
    ]
    merged = dedupe_merge_periods(
        addr, keys=[p.id_col], identity_cols=identity,
        period_cols=("beginDate", "endDate"),
    )
    return nest_children(
        cand,
        merged,
        on=p.id_col,
        child_struct_cols=[*identity, "periods"],
        array_col="addresses",
    )


def serialize_documents(docs: DataFrame, id_col: str = "teacherCandidateIdentifier") -> DataFrame:
    """Documents as (key, json) rows ready for the REST sink (ref R23:
    Gson + ISO dates ≙ to_json with DateType rendering yyyy-MM-dd)."""
    payload = F.to_json(F.struct(*[c for c in docs.columns]))
    return docs.select(F.col(id_col).alias("key"), payload.alias("json"))


def plan_sync(
    docs: DataFrame, remote: DataFrame, id_col: str = "teacherCandidateIdentifier"
) -> tuple[DataFrame, DataFrame]:
    """Full-snapshot reconciliation: (upserts=docs, deletes=remote-only)."""
    return reconcile_snapshot(docs, remote, id_col)
