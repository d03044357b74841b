"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages`` fetch universe (FIXTURES.md §1 schema: url, warc_ts,
html, text, lang + fetch-simulation columns status/location/content_type/
content_encoding) and a ``seeds`` job list. Every page is a PURE FUNCTION of
(seed, host_index, page_index) — no global RNG, no wall clock — so the
pure-Python fixture path and the distributed Spark path (spark.range →
mapInPandas) emit byte-identical rows, and any subset of pages can be
regenerated independently on any executor (this is what lets the generator
scale to a 10^6+-page bench corpus without driver memory).

The ``text`` column is produced by the SAME pinned extractor the engine uses
(functions/extract.py), so the per-row byte-identical-text invariant is
checkable end to end.

Page features are keyed off stable per-page hashes:
- redirect pages (301/302 + location), redirect chains, a >max_redirect chain
- 404s / 503s, non-HTML content types, gzip-encoded bodies, oversized bodies
- per-host robots.txt: Disallow subtree | 404 (allow-all) | text/html
  (quarantine, reference load_filters.rs:92-94) | explicit allow-all
- nofollow links, off-domain links, www-prefixed variants, fragments,
  unsorted query params (canonicalizer work), mailto/js links (scheme filter)
- zipf-ish host sizes for hot-host skew
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
from dataclasses import dataclass

from crusty_core_spark.functions.extract import extract_document

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _h(*parts) -> int:
    """Stable 64-bit hash of the given parts (no process-salted hash())."""
    b = ("|".join(str(p) for p in parts)).encode()
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


@dataclass(frozen=True)
class CorpusSpec:
    n_hosts: int = 10
    base_pages_per_host: int = 20
    links_per_page: int = 6
    words_per_page: int = 40  # body size knob (~6 bytes/word of HTML)
    cross_host_link_prob_pct: int = 10  # percent of links that go off-domain
    zipf_hot_host_factor: int = 1  # host 0 gets factor× pages (skew knob)
    gzip_prob_pct: int = 10
    seed: int = 42

    def pages_per_host(self, host_i: int) -> int:
        if host_i == 0:
            return self.base_pages_per_host * self.zipf_hot_host_factor
        return max(3, int(self.base_pages_per_host / (1 + host_i % 5)))


def host_name(spec: CorpusSpec, host_i: int) -> str:
    www = "www." if _h(spec.seed, "www", host_i) % 3 == 0 else ""
    return f"{www}site{host_i}.example"


def page_url(spec: CorpusSpec, host_i: int, page_i: int) -> str:
    host = host_name(spec, host_i)
    if page_i == 0:
        return f"http://{host}/"
    if _h(spec.seed, "private", host_i, page_i) % 7 == 0:
        return f"http://{host}/private/p{page_i}"
    return f"http://{host}/page/p{page_i}"


def robots_body(spec: CorpusSpec, host_i: int) -> tuple[bytes, int, str]:
    """(body, status, content_type) for host's /robots.txt.

    Mode mix exercises every reference edge case
    (load_filters.rs:53-112)."""
    mode = _h(spec.seed, "robots", host_i) % 10
    if mode < 5:  # normal: disallow the /private/ subtree
        return (b"User-agent: *\nDisallow: /private/\nAllow: /\n", 200, "text/plain")
    if mode < 7:  # missing robots → 4xx → allow-all matcher
        return (b"not found", 404, "text/html")
    if mode == 7:  # served as text/html → host quarantined
        return (b"<html>robots</html>", 200, "text/html")
    return (b"User-agent: *\nAllow: /\n", 200, "text/plain")


def _page_kind(spec: CorpusSpec, host_i: int, page_i: int) -> str:
    if page_i == 0:
        return "html"
    r = _h(spec.seed, "kind", host_i, page_i) % 29
    if r == 3:
        return "redirect"
    if r == 4:
        return "redirect_chain"  # long chain that exceeds max_redirect
    if r == 5:
        return "missing"  # 404
    if r == 6:
        return "image"  # content-type reject
    if r == 7:
        return "error"  # 503
    return "html"


def _link_targets(spec: CorpusSpec, host_i: int, page_i: int) -> list[tuple[str, str]]:
    """(href, rel) pairs for a page, deterministic document order."""
    n_pages = spec.pages_per_host(host_i)
    out = []
    for k in range(spec.links_per_page):
        r = _h(spec.seed, "link", host_i, page_i, k)
        if r % 100 < spec.cross_host_link_prob_pct and spec.n_hosts > 1:
            other = (host_i + 1 + r % (spec.n_hosts - 1)) % spec.n_hosts
            href = page_url(spec, other, (r >> 8) % spec.pages_per_host(other))
        else:
            tgt = (page_i * 7 + 3 * k + 1) % n_pages
            base = page_url(spec, host_i, tgt)
            # relative forms + fragments + unsorted params to exercise
            # canonicalization (types.rs:438-443)
            if r % 19 == 0:
                # unsorted params → canonicalizer sorts; the row doesn't exist
                # in the universe, exercising the fetch-error path
                href = base + "?b=%d&a=%d" % (r % 3, r % 5)
            else:
                form = r % 3
                if form == 0:
                    href = base
                elif form == 1:
                    href = base.split(".example", 1)[1] or "/"
                else:
                    href = base + "#section-%d" % (r % 4)
        rel = "no-follow" if r % 17 == 0 else ""
        out.append((href, rel))
    if _h(spec.seed, "mailto", host_i, page_i) % 11 == 0:
        out.append(("mailto:owner@site%d.example" % host_i, ""))
    if _h(spec.seed, "js", host_i, page_i) % 13 == 0:
        out.append(("javascript:void(0)", ""))
    return out


def _html_body(spec: CorpusSpec, host_i: int, page_i: int) -> bytes:
    links = _link_targets(spec, host_i, page_i)
    n_words = spec.words_per_page // 2 + _h(spec.seed, "len", host_i, page_i) % max(
        spec.words_per_page, 1
    )
    words = [
        "w%d" % (_h(spec.seed, "word", host_i, page_i, i) % 500)
        for i in range(n_words)
    ]
    anchors = "\n".join(
        '<a href="%s"%s%s>link %d</a>'
        % (
            href,
            ' rel="no-follow"' if rel else "",
            ' alt=" alt %d "' % i if _h(spec.seed, "alt", host_i, page_i, i) % 5 == 0
            else "",
            i,
        )
        for i, (href, rel) in enumerate(links)
    )
    # deterministic <img> tags so the LoadImages expander has coverage
    n_imgs = _h(spec.seed, "img", host_i, page_i) % 3
    images = "\n".join(
        '<img src="/static/img%d_%d.png" alt="pic %d">' % (page_i, k, k)
        for k in range(n_imgs)
    )
    title = "Page p%d of site%d" % (page_i, host_i)
    html = (
        "<html><head><title>%s</title></head><body>\n"
        "<h1>%s</h1>\n<p>%s</p>\n%s\n%s\n</body></html>"
    ) % (title, title, " ".join(words), images, anchors)
    return html.encode("utf-8")


def gen_page_row(spec: CorpusSpec, host_i: int, page_i: int) -> list[dict]:
    """All pages rows for (host, page) — a redirect emits its hop rows too."""
    url = page_url(spec, host_i, page_i)
    ts = EPOCH + dt.timedelta(seconds=_h(spec.seed, "ts", host_i, page_i) % 10_000_000)
    kind = _page_kind(spec, host_i, page_i)
    n_pages = spec.pages_per_host(host_i)
    base = {
        "url": url,
        "warc_ts": ts,
        "lang": "en",
        "content_encoding": None,
        "location": None,
    }
    if kind == "missing":
        return [dict(base, html=b"<html>gone</html>", text="gone", status=404,
                     content_type="text/html")]
    if kind == "error":
        return [dict(base, html=b"oops", text="oops", status=503,
                     content_type="text/html")]
    if kind == "image":
        return [dict(base, html=b"\x89PNG fake", text="", status=200,
                     content_type="image/png")]
    if kind in ("redirect", "redirect_chain"):
        hops = 2 if kind == "redirect" else 7  # 7 > max_redirect(5)
        rows = []
        cur = url
        for hop in range(hops):
            nxt = (
                page_url(spec, host_i, (page_i + 1) % n_pages)
                if hop == hops - 1
                else url + "?hop=%d" % (hop + 1)
            )
            rows.append(
                dict(
                    base,
                    url=cur,
                    html=b"",
                    text="",
                    status=301 if hop % 2 == 0 else 302,
                    content_type="text/html",
                    location=nxt,
                )
            )
            cur = nxt
        return rows
    body = _html_body(spec, host_i, page_i)
    text = extract_document(body)["text"]
    enc = None
    if _h(spec.seed, "gzip", host_i, page_i) % 100 < spec.gzip_prob_pct:
        body = gzip.compress(body, compresslevel=1, mtime=0)
        enc = "gzip"
    return [
        dict(base, html=body, text=text, status=200, content_type="text/html",
             content_encoding=enc)
    ]


def gen_robots_row(spec: CorpusSpec, host_i: int) -> dict:
    body, status, ctype = robots_body(spec, host_i)
    return {
        "url": "http://%s/robots.txt" % host_name(spec, host_i),
        "warc_ts": EPOCH,
        "html": body,
        "text": "",
        "lang": "en",
        "status": status,
        "content_type": ctype,
        "content_encoding": None,
        "location": None,
    }


def gen_hosts(spec: CorpusSpec) -> list[dict]:
    """DNS dim table rows (FIXTURES.md §4): some hosts resolve to reserved
    subnets to exercise the IP blacklist (resolver.rs:72-106,147-196)."""
    rows = []
    for h in range(spec.n_hosts):
        r = _h(spec.seed, "dns", h)
        if r % 11 == 3:  # all addrs reserved → resolve fails
            addrs = ["10.0.0.%d" % (r % 250 + 1), "192.168.1.%d" % (r % 250 + 1)]
        elif r % 11 == 4:  # mixed: one public survives
            addrs = ["172.16.0.9", "93.184.216.%d" % (r % 250 + 1)]
        else:
            addrs = ["93.184.215.%d" % (r % 250 + 1)]
        rows.append({"host": host_name(spec, h), "addrs": addrs})
    return rows


def gen_corpus(spec: CorpusSpec) -> tuple[list[dict], list[tuple[int, str]]]:
    """Pure-Python path: full pages list + seeds (fixture scale)."""
    rows: list[dict] = []
    for h in range(spec.n_hosts):
        rows.append(gen_robots_row(spec, h))
        for p in range(spec.pages_per_host(h)):
            rows.extend(gen_page_row(spec, h, p))
    seeds = [(j, page_url(spec, j, 0)) for j in range(spec.n_hosts)]
    return rows, seeds


PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "status int, location string, content_type string, content_encoding string"
)


def gen_pages_spark(spark, spec: CorpusSpec):
    """Distributed path: same rows via spark.range over host indices.

    Each partition regenerates only its hosts — O(1) driver memory, scales to
    bench corpora. Row content identical to gen_corpus by construction."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for h in pdf["id"].tolist():
                rows.append(gen_robots_row(spec, int(h)))
                for p in range(spec.pages_per_host(int(h))):
                    rows.extend(gen_page_row(spec, int(h), p))
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out[
                ["url", "warc_ts", "html", "text", "lang", "status", "location",
                 "content_type", "content_encoding"]
            ]

    n_part = min(spec.n_hosts, 256) or 1
    return (
        spark.range(0, spec.n_hosts, 1, n_part)
        .mapInPandas(gen, schema=PAGES_DDL)
    )
