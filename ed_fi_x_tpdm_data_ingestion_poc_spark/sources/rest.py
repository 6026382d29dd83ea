"""Paginated REST source with OAuth2 client-credentials auth.

Replaces the reference's REST reads (ref R16/R22):
  * TokenRetriever.obtainNewBearerToken — POST form grant with Basic auth
    (/root/reference/banner-connector/src/main/java/org/edfi/sis/api/
    TokenRetriever.java:44-73),
  * get*Descriptors(offset=0, limit=100, ...) — which reads ONLY the first
    page, silently truncating vocabularies >100 rows
    (service/SisConnectorService.java:493, 694).

Engine fixes + scale design:
  * pagination loops until a short page — no truncation;
  * when the endpoint reports a total count, pages are planned up front and
    fetched IN EXECUTORS via mapInPandas (driver never holds the dataset);
  * 401 -> one token refresh + retry, per call (the reference's retry
    pattern, SisConnectorService.java:494-501), token re-fetchable inside
    executors from broadcast client credentials.

Only stdlib HTTP (urllib) — no extra dependencies.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class OAuthConfig:
    """OAuth2 client-credentials grant (TokenRetriever.java:44-73)."""

    token_url: str
    client_id: str
    client_secret: str


@dataclass
class RestSource:
    base_url: str
    path: str
    page_size: int = 500
    auth: OAuthConfig | None = None
    extra_params: dict[str, str] = field(default_factory=dict)
    timeout_sec: float = 30.0


def fetch_token(auth: OAuthConfig, timeout: float = 30.0) -> str:
    """POST grant_type=client_credentials with Basic auth; parse access_token."""
    basic = base64.b64encode(
        f"{auth.client_id}:{auth.client_secret}".encode()
    ).decode()
    req = urllib.request.Request(
        auth.token_url,
        data=b"grant_type=client_credentials",
        headers={
            "Authorization": f"Basic {basic}",
            "Content-Type": "application/x-www-form-urlencoded",
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())["access_token"]


def _get(url: str, token: str | None, timeout: float) -> tuple[int, bytes, dict]:
    headers = {"Accept": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def _page_url(src: RestSource, offset: int, limit: int, total_count: bool = False) -> str:
    params = {"offset": str(offset), "limit": str(limit), **src.extra_params}
    if total_count:
        params["totalCount"] = "true"
    return f"{src.base_url.rstrip('/')}/{src.path.lstrip('/')}?" + urllib.parse.urlencode(params)


def fetch_page(src: RestSource, offset: int, token: str | None) -> list[dict]:
    """One page with the reference's 401-refresh-retry pattern."""
    url = _page_url(src, offset, src.page_size)
    status, body, _ = _get(url, token, src.timeout_sec)
    if status == 401 and src.auth is not None:
        token = fetch_token(src.auth, src.timeout_sec)
        status, body, _ = _get(url, token, src.timeout_sec)
    if status != 200:
        raise OSError(f"REST GET {url} failed: HTTP {status}: {body[:200]!r}")
    return json.loads(body)


def iter_all_rows(src: RestSource, token: str | None = None) -> Iterator[dict]:
    """Loop offset += page_size until a short page (fixes the reference's
    first-page-only truncation)."""
    if token is None and src.auth is not None:
        token = fetch_token(src.auth, src.timeout_sec)
    offset = 0
    while True:
        page = fetch_page(src, offset, token)
        yield from page
        if len(page) < src.page_size:
            return
        offset += src.page_size


def get_by_id(
    src: RestSource, rid: str, *, etag: str | None = None, token: str | None = None
) -> tuple[int, dict | None, str | None]:
    """GET a single resource by id with optional If-None-Match conditional
    read (ref R20, TeacherCandidatesApi.java:508): returns (status, doc,
    etag); 304 -> (304, None, etag) meaning the cached copy is current."""
    if token is None and src.auth is not None:
        token = fetch_token(src.auth, src.timeout_sec)
    url = f"{src.base_url.rstrip('/')}/{src.path.lstrip('/')}/{rid}"
    headers = {"Accept": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    if etag is not None:
        headers["If-None-Match"] = str(etag)
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=src.timeout_sec) as resp:
            status, body, hdrs = resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        status, body, hdrs = e.code, e.read(), dict(e.headers)
    if status == 304:
        return 304, None, etag
    new_etag = next((v for k, v in hdrs.items() if k.lower() == "etag"), None)
    return status, (json.loads(body) if status == 200 and body else None), new_etag


def read_rest(
    spark: SparkSession,
    src: RestSource,
    schema: StructType,
    *,
    total_count_header: str = "Total-Count",
) -> DataFrame:
    """Paginated REST endpoint as a DataFrame.

    Scale path: HEAD-style count probe (offset=0, limit=1, totalCount=true)
    -> plan page offsets -> executors fetch pages in parallel and parse JSON
    into `schema` (distributed; the driver holds only the offset list).
    Fallback when the endpoint doesn't report a count: sequential driver
    pagination (still complete, just not parallel).
    """
    token = fetch_token(src.auth, src.timeout_sec) if src.auth else None
    status, body, headers = _get(
        _page_url(src, 0, 1, total_count=True), token, src.timeout_sec
    )
    total: int | None = None
    if status == 200:
        for k, v in headers.items():
            if k.lower() == total_count_header.lower():
                total = int(v)
                break

    if total is None:
        rows = list(iter_all_rows(src, token))
        return spark.createDataFrame(rows, schema=schema)  # type: ignore[arg-type]

    # spark.range with step = page_size plans the offsets as a pure-JVM
    # Range scan, one partition per slice (a createDataFrame(list) plan is
    # a Python-RDD scan + repartition exchange re-executed per run)
    n_offsets = len(range(0, max(total, 1), src.page_size))
    plan = spark.range(
        0, max(total, 1), src.page_size, min(n_offsets, 64)
    ).withColumnRenamed("id", "offset")

    # Executor closure must be SELF-CONTAINED: cloudpickle serializes
    # module-level functions/classes by reference, and executor Python
    # workers need not have this package on sys.path. Close over plain data
    # and use only stdlib + pandas inside.
    endpoint = f"{src.base_url.rstrip('/')}/{src.path.lstrip('/')}"
    extra_params = dict(src.extra_params)
    page_size = src.page_size
    timeout = src.timeout_sec
    auth_tuple = (
        (src.auth.token_url, src.auth.client_id, src.auth.client_secret)
        if src.auth
        else None
    )
    field_names = [f.name for f in schema.fields]
    init_token = token

    def fetch_partition(batches):
        import base64 as _b64
        import json as _json
        import urllib.parse as _up
        import urllib.request as _ur
        import urllib.error as _ue

        import pandas as pd

        def _fetch_token():
            tok_url, cid, secret = auth_tuple
            basic = _b64.b64encode(f"{cid}:{secret}".encode()).decode()
            req = _ur.Request(
                tok_url,
                data=b"grant_type=client_credentials",
                headers={
                    "Authorization": f"Basic {basic}",
                    "Content-Type": "application/x-www-form-urlencoded",
                },
                method="POST",
            )
            with _ur.urlopen(req, timeout=timeout) as resp:
                return _json.loads(resp.read())["access_token"]

        def _get_page(offset, tok):
            url = endpoint + "?" + _up.urlencode(
                {"offset": str(offset), "limit": str(page_size), **extra_params}
            )
            headers = {"Accept": "application/json"}
            if tok:
                headers["Authorization"] = f"Bearer {tok}"
            try:
                with _ur.urlopen(_ur.Request(url, headers=headers), timeout=timeout) as r:
                    return r.status, r.read()
            except _ue.HTTPError as e:
                return e.code, e.read()

        tok = init_token
        for pdf in batches:
            for off in pdf["offset"]:
                status, body = _get_page(int(off), tok)
                if status == 401 and auth_tuple is not None:
                    tok = _fetch_token()
                    status, body = _get_page(int(off), tok)
                if status != 200:
                    raise OSError(f"REST page offset={off} failed: HTTP {status}")
                page = _json.loads(body)
                yield pd.DataFrame(
                    {name: [r.get(name) for r in page] for name in field_names}
                )

    json_df = plan.mapInPandas(fetch_partition, schema=schema)
    # Columns arrive as python objects; enforce declared types.
    return json_df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
