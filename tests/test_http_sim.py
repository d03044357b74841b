"""Wire-level byte tap + response header map (functions/http_sim.py).

Three layers:
1. Column expressions ≡ pure-python formulas on a hand-built matrix of
   edge cases (resolve failure, DNS-only, missing page, redirect,
   rejected content type, Head target, gzip body, oversized body).
2. Engine fetch_log ≡ simulator fetch_log on a real crawl (the engine
   side exercises the distributed path AND the driver-local fast path
   depending on iteration width — both must match the simulator).
3. Metrics table byte totals == fetch_log sums (the per-iteration tap,
   hyper_utils.rs Stats read()/write()).
"""

from __future__ import annotations

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.functions import http_sim as HS
from crusty_core_spark.sources.datagen import CorpusSpec

from tests.test_crawl_parity import run_both

CASES = [
    # url, host, resolve_failed, target, status, ctype, cenc, loc, html
    ("http://a.example/", "a.example", True, "Follow", None, None, None,
     None, None),
    ("http://a.example/", "a.example", False, "JustResolveDNS", 200,
     "text/html", None, None, b"<html>x</html>"),
    ("http://a.example/missing", "a.example", False, "Follow", None, None,
     None, None, None),
    ("http://a.example/r", "a.example", False, "Follow", 301, "text/html",
     None, "http://a.example/t", b""),
    ("http://a.example/img", "a.example", False, "Follow", 200, "image/png",
     None, None, b"\x89PNG"),
    ("http://a.example/h", "a.example", False, "Head", 200, "text/html",
     None, None, b"<html>head</html>"),
    ("http://a.example/p", "a.example", False, "Follow", 200,
     "text/html; charset=utf-8", None, None, b"<html>ok</html>"),
    ("http://a.example/gz", "a.example", False, "Follow", 200, "text/html",
     "gzip", None, b"\x1f\x8b fakegz"),
    ("http://a.example/robots.txt", "a.example", False, "Load", 404,
     "text/html", None, None, b"not found"),
]


def _py_expected(cfg):
    out = []
    for (url, host, rf, target, status, ct, ce, loc, html) in CASES:
        h, rd, wr = HS.io_metrics(
            url=url, host=host, user_agent=cfg.user_agent,
            resolve_failed=rf, target=target, status=status,
            content_type=ct, content_encoding=ce, location=loc,
            body_len=len(html) if html is not None else None,
            accepted_content_types=cfg.accepted_content_types,
        )
        out.append((url, h, rd, wr))
    return out


def test_column_matches_python(spark):
    import pandas as pd

    cfg = CrawlConfig()
    pdf = pd.DataFrame(
        CASES,
        columns=["url", "host", "resolve_failed", "target", "status",
                 "content_type", "content_encoding", "location", "html"],
    )
    sdf = spark.createDataFrame(
        pdf,
        schema=("url string, host string, resolve_failed boolean, "
                "target string, status int, content_type string, "
                "content_encoding string, location string, html binary"),
    )
    h, rd, wr = HS.with_io_columns(sdf, cfg)
    got = {
        r["url"]: (r["headers"], r["read_size"], r["write_size"])
        for r in sdf.select(
            "url", h.alias("headers"), rd.alias("read_size"),
            wr.alias("write_size")
        ).collect()
    }
    for url, eh, erd, ewr in _py_expected(cfg):
        gh, grd, gwr = got[url]
        assert (gh or None) == (eh or None), url
        assert grd == erd, url
        assert gwr == ewr, url
    # sanity on absolute values: request head formula
    assert got["http://a.example/p"][2] == HS.request_size(
        "http://a.example/p", "a.example", cfg.user_agent
    )
    # processed row reads head + body
    hdrs = got["http://a.example/p"][0]
    assert got["http://a.example/p"][1] == HS.head_size(hdrs) + len(
        b"<html>ok</html>"
    )
    # multi-valued header map (HeaderMap is HashMap<String, Vec<String>>,
    # types.rs:212-231): every value is a list
    assert list(hdrs["content-length"]) == [str(len(b"<html>ok</html>"))]
    assert list(hdrs["server"]) == [HS.SERVER]


def test_custom_request_headers_write_size(spark):
    """cfg.custom_headers (config.rs:305-312) add one k: v CRLF line each
    to the request head — write_size grows identically in the Column path
    and the python mirror; repeated names count once per value."""
    import pandas as pd

    hdrs = (("x-crawl-run", "r3"), ("accept-language", "en"),
            ("accept-language", "de"))
    cfg = CrawlConfig(custom_headers=hdrs)
    base = CrawlConfig()
    extra = sum(len(k) + len(v) + 4 for k, v in hdrs)
    assert HS.custom_header_bytes(hdrs) == extra
    url, host = "http://a.example/p", "a.example"
    assert HS.request_size(url, host, cfg.user_agent, hdrs) == (
        HS.request_size(url, host, base.user_agent) + extra
    )
    pdf = pd.DataFrame(
        [CASES[6]],
        columns=["url", "host", "resolve_failed", "target", "status",
                 "content_type", "content_encoding", "location", "html"],
    )
    sdf = spark.createDataFrame(
        pdf,
        schema=("url string, host string, resolve_failed boolean, "
                "target string, status int, content_type string, "
                "content_encoding string, location string, html binary"),
    )
    _, _, wr_custom = HS.with_io_columns(sdf, cfg)
    _, _, wr_base = HS.with_io_columns(sdf, base)
    row = sdf.select(wr_custom.alias("c"), wr_base.alias("b")).collect()[0]
    assert row["c"] == row["b"] + extra
    # round-trips through the checkpoint manifest
    assert CrawlConfig.from_dict(cfg.to_dict()) == cfg


def test_multivalue_head_size():
    """head_size serializes one k: v CRLF line per VALUE."""
    single = {"server": [HS.SERVER], "set-cookie": ["a=1"]}
    multi = {"server": [HS.SERVER], "set-cookie": ["a=1", "b=2"]}
    assert HS.head_size(multi) == HS.head_size(single) + len(
        "set-cookie"
    ) + len("b=2") + 4


def test_engine_sim_io_parity(spark, workdir):
    """headers/read_size/write_size byte-identical engine vs simulator on a
    corpus with redirects, robots modes, images, errors."""
    spec = CorpusSpec(n_hosts=6, base_pages_per_host=14, seed=42)
    sim, eng = run_both(
        spark, workdir, spec,
        CrawlConfig(custom_headers=(("x-crawl-run", "parity"),)),
    )
    e = {
        (r.iter, r.job_id, r.task_seq): (
            dict(r.headers) if r.headers is not None else None,
            r.read_size,
            r.write_size,
        )
        for r in eng.io.read("fetch_log").collect()
    }
    s = {
        (r["iter"], r["job_id"], r["task_seq"]): (
            r["headers"], r["read_size"], r["write_size"])
        for r in sim.fetch_log
    }
    assert e == s
    # the tap saw real traffic
    assert sum(v[1] for v in e.values()) > 0
    assert sum(v[2] for v in e.values()) > 0


def test_metrics_byte_tap(spark, workdir):
    """metrics.bytes_fetched/bytes_sent per iteration == fetch_log sums."""
    from pyspark.sql import functions as F

    spec = CorpusSpec(n_hosts=4, base_pages_per_host=10, seed=7)
    _sim, eng = run_both(spark, workdir, spec, CrawlConfig())
    m = {
        r.iter: (r.bytes_fetched, r.bytes_sent)
        for r in eng.flush_metrics().collect()
    }
    fl = {
        r["iter"]: (r["rd"], r["wr"])
        for r in eng.io.read("fetch_log")
        .groupBy("iter")
        .agg(F.sum("read_size").alias("rd"), F.sum("write_size").alias("wr"))
        .collect()
    }
    for it, (rd, wr) in fl.items():
        assert m[it] == (rd, wr), it


def test_io_metrics_rows_matches_scalar():
    """The batch twin must reproduce io_metrics row for row across the
    full condition space (resolve-failed / DNS-only / no-status /
    redirect / content-type accept-reject / Head / missing body)."""
    import itertools

    from crusty_core_spark.functions.http_sim import io_metrics, io_metrics_rows

    rows = []
    for rf, tgt, st, ct, ce, loc, bl in itertools.product(
        [False, True],
        ["Follow", "Head", "JustResolveDNS", "Load"],
        [None, 200, 301, 302, 399, 400, 404, 503],
        [None, "text/html", "text/html; charset=utf-8", "image/png"],
        [None, "gzip"],
        [None, "http://h.example/next"],
        [None, 0, 12345],
    ):
        rows.append((f"http://h{len(rows)}.example/p/{len(rows)}",
                     f"h{len(rows)}.example", rf, tgt, st, ct, ce, loc, bl))

    ua = "test-agent/9"
    accepted = ("text/html",)
    custom = (("x-one", "1"), ("x-two", "22"))
    got = io_metrics_rows(
        urls=[r[0] for r in rows],
        hosts=[r[1] for r in rows],
        user_agent=ua,
        resolve_failed=[r[2] for r in rows],
        targets=[r[3] for r in rows],
        statuses=[r[4] for r in rows],
        content_types=[r[5] for r in rows],
        content_encodings=[r[6] for r in rows],
        locations=[r[7] for r in rows],
        body_lens=[r[8] for r in rows],
        accepted_content_types=accepted,
        custom_headers=custom,
    )
    for i, r in enumerate(rows):
        h, rd, wr = io_metrics(
            url=r[0], host=r[1], user_agent=ua, resolve_failed=r[2],
            target=r[3], status=r[4], content_type=r[5],
            content_encoding=r[6], location=r[7], body_len=r[8],
            accepted_content_types=accepted, custom_headers=custom,
        )
        assert got[0][i] == h, r
        assert got[1][i] == rd, r
        assert got[2][i] == wr, r
