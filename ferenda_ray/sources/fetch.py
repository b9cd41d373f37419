"""Fetch stage: conditional-GET document download as an actor pool.

The transfer half of the reference's *download* action
(``download_if_needed`` + ``_addheaders``,
``documentrepository.py:936-1094``): per document, send
``If-None-Match`` (prior ETag) and ``If-Modified-Since`` (prior fetch
time) — BOTH, because some servers honor only one (``:991-1005``) —
and on 304 keep the existing content; on 200 with identical bytes
record "checked, not changed"; on changed bytes archive-and-replace.
Restated dataset-native: prior state travels IN the rows
``(url, etag, last_modified, content_sha256)`` and the verdict comes
OUT as ``fetch_status ∈ {new, updated, unchanged, not_modified,
error:<code>}`` — the documententry bookkeeping without a file tree.

The stage is a callable class for ``map_batches(Fetcher,
concurrency=(1, N))``: one transport (e.g. a ``requests.Session``
keep-alive pool) per actor, built in ``__init__`` — the reference's
per-process ``session`` property.  No network exists in this sandbox,
so the default transport raises ``NotImplementedError``; tests inject
:class:`DictTransport`.  The Ray-side plumbing (schema, batching,
actor signature) is real and tested.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


class DictTransport:
    """Deterministic in-memory transport: {url: (status, headers,
    body)}.  Honors If-None-Match / If-Modified-Since like an
    HTTP cache would."""

    def __init__(self, responses: dict):
        self.responses = responses

    def __call__(self, url: str, headers: dict) -> tuple:
        if url not in self.responses:
            return 404, {}, b""
        status, resp_headers, body = self.responses[url]
        etag = resp_headers.get("ETag")
        if etag and headers.get("If-None-Match") == etag:
            return 304, resp_headers, b""
        modified = resp_headers.get("Last-Modified")
        if modified and headers.get("If-Modified-Since") == modified:
            return 304, resp_headers, b""
        return status, resp_headers, body


def requests_transport(useragent: str = "ferenda-ray"):
    """Real-network transport: one keep-alive ``requests.Session`` per
    actor (``documentrepository.py`` session property).  Unavailable
    in the sandbox — import-gated."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("requests not available") from e

    session = requests.Session()
    session.headers["User-Agent"] = useragent

    def transport(url: str, headers: dict) -> tuple:
        r = session.get(url, headers=headers, timeout=30)
        return r.status_code, dict(r.headers), r.content

    return transport


class Fetcher:
    """``map_batches`` callable: conditional fetch per row.

    In-columns: ``url`` (required); optional prior state ``etag``,
    ``last_modified``, ``content_sha256``.
    Out-columns: ``url, fetch_status, content, content_sha256, etag,
    last_modified``.
    """

    IN_OPTIONAL = ("etag", "last_modified", "content_sha256")

    def __init__(self, transport=None, transport_factory=None,
                 useragent: str = "ferenda-ray"):
        if transport is None:
            transport = (transport_factory() if transport_factory
                         else requests_transport(useragent))
        self.transport = transport
        self.useragent = useragent

    def _headers(self, etag, last_modified) -> dict:
        # both conditional headers when known (documentrepository.py:991-1005)
        h = {"User-Agent": self.useragent}
        if etag:
            h["If-None-Match"] = etag
        if last_modified:
            h["If-Modified-Since"] = last_modified
        return h

    def fetch_one(self, url: str, etag=None, last_modified=None,
                  prior_sha=None) -> dict:
        status, headers, body = self.transport(
            url, self._headers(etag, last_modified))
        if status == 304:
            return {"url": url, "fetch_status": "not_modified",
                    "content": b"", "content_sha256": prior_sha,
                    "etag": etag, "last_modified": last_modified}
        if status != 200:
            return {"url": url, "fetch_status": f"error:{status}",
                    "content": b"", "content_sha256": prior_sha,
                    "etag": etag, "last_modified": last_modified}
        sha = hashlib.sha256(body).hexdigest()
        if prior_sha is None:
            verdict = "new"
        elif sha == prior_sha:
            # 200 with identical bytes: checked but unchanged
            verdict = "unchanged"
        else:
            verdict = "updated"
        return {"url": url, "fetch_status": verdict, "content": body,
                "content_sha256": sha,
                "etag": headers.get("ETag", etag),
                "last_modified": headers.get("Last-Modified",
                                             last_modified)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: (batch.column(c).to_pylist()
                    if c in batch.column_names else [None] * n)
                for c in self.IN_OPTIONAL}
        rows = [self.fetch_one(url, cols["etag"][i],
                               cols["last_modified"][i],
                               cols["content_sha256"][i])
                for i, url in enumerate(batch.column("url").to_pylist())]
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "fetch_status": pa.array([r["fetch_status"] for r in rows],
                                     pa.string()),
            "content": pa.array([r["content"] for r in rows],
                                pa.large_binary()),
            "content_sha256": pa.array([r["content_sha256"] for r in rows],
                                       pa.string()),
            "etag": pa.array([r["etag"] for r in rows], pa.string()),
            "last_modified": pa.array([r["last_modified"] for r in rows],
                                      pa.string()),
        })


def fetch(ds, transport_factory=None, concurrency=(1, 8),
          batch_size: int = 64):
    """Attach the fetch actor pool to a Dataset of ``(url, [etag,
    last_modified, content_sha256])`` rows.  ``transport_factory`` is
    called once per actor (session reuse); small ``batch_size`` because
    rows carry whole document bodies out."""
    return ds.map_batches(
        Fetcher,
        fn_constructor_kwargs={"transport_factory": transport_factory},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def drop_tombstones(ds, content_col: str = "content",
                    status_col: str = "fetch_status"):
    """Explicit tombstone gate before parse: drop rows whose download
    produced no usable content — empty bodies (the reference skips
    zero-byte downloaded files, ``documentrepository.py:831``,
    ``documentstore.py:604-607``) and ``error:*`` /``not_modified``
    statuses.  Vectorized in-batch filter; the dropped rows stay in
    the fetch output for bookkeeping (``tombstones`` view below)."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        ok_status = pc.invert(pc.or_(
            pc.match_substring_regex(b.column(status_col), "^error:"),
            pc.equal(b.column(status_col), "not_modified")))
        nonempty = pc.greater(
            pc.binary_length(b.column(content_col)), 0)
        return b.filter(pc.and_(ok_status, nonempty))

    return ds.map_batches(keep, batch_format="pyarrow")


def tombstones(ds, content_col: str = "content",
               status_col: str = "fetch_status"):
    """The complement of :func:`drop_tombstones` — rows parse must
    skip, for status reporting."""
    import pyarrow.compute as pc

    def only(b: pa.Table) -> pa.Table:
        bad = pc.or_(
            pc.or_(
                pc.match_substring_regex(b.column(status_col),
                                         "^error:"),
                pc.equal(b.column(status_col), "not_modified")),
            pc.equal(pc.binary_length(b.column(content_col)), 0))
        return b.filter(bad).select(["url", status_col])

    return ds.map_batches(only, batch_format="pyarrow")
