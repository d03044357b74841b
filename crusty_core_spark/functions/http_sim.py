"""Deterministic HTTP wire-level simulation: response header map plus
read/write byte counters per fetch, shared by the Spark engine
(Column expressions), the driver-local fast path (pure python) and the
reference simulator, so all three emit byte-identical fetch_log columns.

Models the reference's per-request records:

- ``HttpStatus.headers`` (reference ``main/src/types.rs:233-239``,
  ``HeaderMap`` types.rs:212-231 — ``HashMap<String, Vec<String>>``, i.e.
  MULTI-VALUED) → ``headers map<string,array<string>>`` on fetch_log. The
  simulated origin serves ``server``, ``content-type``, ``content-length``,
  ``content-encoding`` (when the page row declares one) and ``location``
  (on redirects); null-valued entries are omitted. Each simulated header is
  single-valued today, but the schema and the byte accounting support
  repeats (one ``k: v␍␊`` wire line per value, exactly how HTTP serializes
  a repeated header).
- ``LoadMetrics.read_size`` / ``write_size`` byte tap
  (``main/src/types.rs:248-253``; counted at the socket by
  ``CountingStream``, ``main/src/hyper_utils.rs:14-50``) →
  ``read_size`` / ``write_size`` long columns. Wall-clock durations are
  not reproducible across engines, so the Duration halves of
  StatusMetrics/LoadMetrics map to the deterministic ``wait_iters``
  tick counter already on fetch_log; the BYTE halves are modeled
  exactly:

  * ``write_size`` = length of the simulated request head
    ``GET <url> HTTP/1.1␍␊Host: <host>␍␊User-Agent: <ua>␍␊``
    ``Accept-Encoding: gzip, deflate␍␊`` + one ``k: v␍␊`` line per
    configured custom request header (``cfg.custom_headers`` — the
    reference sends ``CrawlingSettings.custom_headers`` on every request,
    ``main/src/config.rs:305-312``) + final ``␍␊``
  * ``read_size`` = len(``HTTP/1.1 NNN␍␊``) + serialized header bytes
    (``k: v␍␊`` per value) + final ``␍␊`` + body bytes — body bytes
    counted only when the pipeline actually loads the body (page exists,
    not a redirect, content-type accepted, target loads:
    task_processor.rs status stage vs load stage). ResolveError /
    JustResolveDNS rows never connect → 0/0 with a null header map;
    HttpError (connected, no response) counts the request write only.

The body-read decision is taken from the BUILT-IN status
classification, before custom status/load filters run — all three
implementations evaluate it at that same stage, so parity holds by
construction (custom status filters that reject a row do not shrink
its read_size; documented simplification).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SERVER = "crusty-sim/1"
_REQ_TEMPLATE = (
    "GET {u} HTTP/1.1\r\nHost: {h}\r\nUser-Agent: {a}\r\n"
    "Accept-Encoding: gzip, deflate\r\n\r\n"
)
#: request-head bytes excluding the url/host/user-agent values
REQ_FIXED = len(_REQ_TEMPLATE.format(u="", h="", a=""))
#: ``HTTP/1.1 NNN\r\n`` (status codes are always three digits here)
STATUS_LINE = len("HTTP/1.1 ") + 3 + 2


def custom_header_bytes(custom_headers) -> int:
    """Wire bytes the configured custom request headers add to every
    request head: one ``k: v\\r\\n`` line per (name, value) pair."""
    return sum(len(k) + len(v) + 4 for k, v in custom_headers)


# ------------------------------------------------------------------ python

def request_size(url: str, host: str, user_agent: str,
                 custom_headers=()) -> int:
    return (
        REQ_FIXED + len(url) + len(host) + len(user_agent)
        + custom_header_bytes(custom_headers)
    )


def response_headers(
    content_type, content_encoding, location, body_len, is_redirect
) -> dict:
    """Simulated origin response headers (name → list of values, matching
    HeaderMap's HashMap<String, Vec<String>>); insertion order is fixed and
    mirrored by the Column builder (map key order is not semantically
    relevant but keeping them identical makes byte-level diffs trivial)."""
    h = {"server": [SERVER]}
    if content_type is not None:
        h["content-type"] = [content_type]
    if body_len is not None:
        h["content-length"] = [str(body_len)]
    if content_encoding is not None:
        h["content-encoding"] = [content_encoding]
    if is_redirect and location is not None:
        h["location"] = [location]
    return h


def head_size(headers: dict) -> int:
    """Status line + ``k: v\\r\\n`` per header VALUE + terminating CRLF."""
    return (
        STATUS_LINE
        + sum(
            len(k) + len(v) + 4
            for k, vs in headers.items()
            for v in vs
        )
        + 2
    )


def io_metrics(
    *,
    url: str,
    host: str,
    user_agent: str,
    resolve_failed: bool,
    target: str,
    status,
    content_type,
    content_encoding,
    location,
    body_len,
    accepted_content_types,
    custom_headers=(),
):
    """(headers|None, read_size, write_size) for one fetch row — the
    python mirror of :func:`with_io_columns`."""
    if resolve_failed or target == "JustResolveDNS":
        return None, 0, 0
    wr = request_size(url, host, user_agent, custom_headers)
    if status is None:
        return None, 0, wr
    status = int(status)
    is_redirect = 300 <= status <= 399
    headers = response_headers(
        content_type, content_encoding, location, body_len, is_redirect
    )
    rd = head_size(headers)
    ct = content_type or ""
    ct_ok = any(a in ct for a in accepted_content_types)
    if (
        not is_redirect
        and ct_ok
        and target != "Head"
        and body_len is not None
    ):
        rd += int(body_len)
    return headers, rd, wr


def io_metrics_rows(
    *,
    urls,
    hosts,
    user_agent: str,
    resolve_failed,
    targets,
    statuses,
    content_types,
    content_encodings,
    locations,
    body_lens,
    accepted_content_types,
    custom_headers=(),
):
    """Batch twin of :func:`io_metrics` — identical formulas, one pass,
    constants hoisted (the per-row call chain request_size →
    response_headers → head_size was ~10 µs/row of pure call overhead on
    a 29k-row fetch_log assembly). Returns (headers_list, read_sizes,
    write_sizes) as plain lists. Pinned row-for-row against io_metrics by
    ``tests/test_http_sim.py::test_io_metrics_rows_matches_scalar``."""
    wr_base = (
        REQ_FIXED + len(user_agent) + custom_header_bytes(custom_headers)
    )
    accepted = tuple(accepted_content_types)
    # head_size constants: STATUS_LINE + trailing CRLF + per-header
    # "k: v\r\n" (len(k) + len(v) + 4); key lengths are fixed
    base_rd = STATUS_LINE + 2 + 6 + len(SERVER) + 4  # + "server" line
    n = len(urls)
    hdr_out: list = [None] * n
    rd_out = [0] * n
    wr_out = [0] * n
    for i in range(n):
        if resolve_failed[i] or targets[i] == "JustResolveDNS":
            continue
        wr_out[i] = wr_base + len(urls[i]) + len(hosts[i])
        st = statuses[i]
        if st is None:
            continue
        st = int(st)
        is_redirect = 300 <= st <= 399
        h = {"server": [SERVER]}
        rd = base_rd
        ct = content_types[i]
        if ct is not None:
            h["content-type"] = [ct]
            rd += 12 + len(ct) + 4
        bl = body_lens[i]
        if bl is not None:
            s = str(bl)
            h["content-length"] = [s]
            rd += 14 + len(s) + 4
        ce = content_encodings[i]
        if ce is not None:
            h["content-encoding"] = [ce]
            rd += 16 + len(ce) + 4
        loc = locations[i]
        if is_redirect and loc is not None:
            h["location"] = [loc]
            rd += 8 + len(loc) + 4
        if not is_redirect and bl is not None and targets[i] != "Head":
            ctt = ct or ""
            for a in accepted:
                if a in ctt:
                    rd += int(bl)
                    break
        hdr_out[i] = h
        rd_out[i] = rd
    return hdr_out, rd_out, wr_out


# ------------------------------------------------------------------ spark

def with_io_columns(df, cfg) -> "tuple[Column, Column, Column]":
    """Build (headers, read_size, write_size) Columns over a fetched
    frame carrying url/host/target/resolve_failed/status/content_type/
    content_encoding/location/html. Pure JVM expressions — no Python
    crossing; whole-stage-codegen friendly."""
    body_len = F.length("html").cast("long")
    is_redirect = (
        F.col("status").isNotNull() & F.col("status").between(300, 399)
    )
    connected = (~F.col("resolve_failed")) & (
        F.col("target") != "JustResolveDNS"
    )
    got_resp = connected & F.col("status").isNotNull()

    # fixed entry order matching response_headers(); null-valued entries
    # dropped (a present header always has >=1 value, so the value arrays
    # are null-or-nonempty, never [null])
    def _val(cond, col):
        return F.when(cond, F.array(col)).alias("value")

    entries = F.array(
        F.struct(
            F.lit("server").alias("key"),
            F.array(F.lit(SERVER)).alias("value"),
        ),
        F.struct(
            F.lit("content-type").alias("key"),
            _val(F.col("content_type").isNotNull(), F.col("content_type")),
        ),
        F.struct(
            F.lit("content-length").alias("key"),
            _val(body_len.isNotNull(), body_len.cast("string")),
        ),
        F.struct(
            F.lit("content-encoding").alias("key"),
            _val(
                F.col("content_encoding").isNotNull(),
                F.col("content_encoding"),
            ),
        ),
        F.struct(
            F.lit("location").alias("key"),
            _val(is_redirect & F.col("location").isNotNull(),
                 F.col("location")),
        ),
    )
    headers = F.when(
        got_resp,
        F.map_from_entries(
            F.filter(entries, lambda e: e["value"].isNotNull())
        ),
    )

    write_size = F.when(
        connected,
        F.lit(REQ_FIXED + custom_header_bytes(cfg.custom_headers))
        + F.length("url")
        + F.length("host")
        + F.lit(len(cfg.user_agent)),
    ).otherwise(F.lit(0)).cast("long")

    # one k: v\r\n line per VALUE (multi-valued headers serialize as
    # repeated lines on the wire)
    hdr_bytes = F.aggregate(
        F.map_entries(headers),
        F.lit(STATUS_LINE + 2),
        lambda acc, e: acc
        + F.aggregate(
            e["value"],
            F.lit(0),
            lambda a, v: a + F.length(e["key"]) + F.length(v) + F.lit(4),
        ),
    )
    ct_ok = F.lit(False)
    for a in cfg.accepted_content_types:
        ct_ok = ct_ok | F.col("content_type").contains(a)
    ct_ok = F.coalesce(ct_ok, F.lit(False))
    body_read = (
        got_resp
        & ~is_redirect
        & ct_ok
        & (F.col("target") != "Head")
        & body_len.isNotNull()
    )
    read_size = (
        F.when(
            got_resp,
            hdr_bytes + F.when(body_read, body_len).otherwise(F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return headers, read_size, write_size
