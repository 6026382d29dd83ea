"""Keyset pagination must reproduce offset/limit pagination page-by-page.

The reference's REST surface pages with offset/limit
(SisConnectorService.java pagination params, R16/R17); paginate() keeps
those semantics and paginate_keyset() is the scale-safe cursor variant.
Walking the whole table through both must yield identical page streams.
"""

from __future__ import annotations

from ed_fi_x_tpdm_data_ingestion_poc_spark.functions.scalars import (
    paginate,
    paginate_keyset,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def _rows(df, cols):
    return [tuple(r) for r in df.select(*cols).collect()]


def test_keyset_matches_offset_page_by_page(spark, sf_dir):
    nation = table(spark, sf_dir, "nation").select(
        "n_regionkey", "n_nationkey", "n_name"
    )
    # non-unique leading key + unique tiebreaker = the interesting case
    order = ["n_regionkey", "n_nationkey"]
    limit = 7
    after = None
    offset = 0
    pages = 0
    while True:
        off_page = _rows(paginate(nation, order, offset=offset, limit=limit), order)
        key_page = _rows(paginate_keyset(nation, order, after=after, limit=limit), order)
        assert key_page == off_page, f"page {pages} diverged"
        if not off_page:
            break
        after = key_page[-1]
        offset += limit
        pages += 1
    assert pages >= 3  # the walk actually exercised multiple pages


def test_keyset_after_excludes_boundary(spark, sf_dir):
    nation = table(spark, sf_dir, "nation")
    order = ["n_nationkey"]
    first = _rows(paginate_keyset(nation, order, limit=5), order)
    second = _rows(paginate_keyset(nation, order, after=first[-1], limit=5), order)
    assert first[-1] not in second
    assert second[0][0] > first[-1][0]


def test_keyset_rejects_arity_mismatch(spark, sf_dir):
    import pytest

    nation = table(spark, sf_dir, "nation")
    with pytest.raises(ValueError):
        paginate_keyset(nation, ["n_nationkey", "n_name"], after=(1,))
