"""HTML link/title/text extraction — the pinned extractor.

The reference extracts, per document (main/src/select_task_expanders.rs:37-51
``FollowLinks`` / :79-93 ``LoadImages``; main/README.md:31 title):

- every ``<a>`` element in document order → a Link with
  ``href`` (raw attr, later joined + fragment-stripped — types.rs:438-443),
  ``rel`` (attr or ""), ``alt`` (attr or "", trimmed — types.rs:448),
  ``text`` (concatenated descendant text, trimmed — types.rs:449)
- every ``<img src>`` in document order → a Load-target link
- ``title`` = text of the FIRST <title> element (first-match semantics)

The reference defines no page-text extractor; BASELINE.json's per-row
invariant ("byte-identical extracted text per url") is pinned against THIS
spec, which both the engine and the fixture generator share:

    text := '\n'.join(stripped, non-empty text nodes in document order,
                      excluding <script>/<style> subtrees)

Implementation: stdlib html.parser (only HTML parser in the sandbox), wrapped
in mapInPandas — Arrow-batched, no per-row Spark UDF. gzip/deflate bodies are
decoded first (reference: main/src/task_processor.rs:73-77).
"""

from __future__ import annotations

import gzip
import zlib
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

LINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("rel", T.StringType()),
            T.StructField("alt", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("links", LINK_TYPE),
        T.StructField("images", LINK_TYPE),
    ]
)

_SKIP_TEXT_TAGS = {"script", "style"}


class _PinnedExtractor(HTMLParser):
    """Single-pass extractor implementing the pinned spec above."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[dict] = []
        self.images: list[dict] = []
        self.title: str | None = None
        self.text_parts: list[str] = []
        self._open_anchors: list[dict] = []
        self._title_parts: list[str] | None = None
        self._title_done = False
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
            return
        d = dict(attrs)
        if tag == "title" and not self._title_done:
            self._title_parts = []
        elif tag == "a":
            # pos assigned at start-tag: document order of <a> occurrences
            self._open_anchors.append(
                {
                    "href": d.get("href"),
                    "rel": d.get("rel") or "",
                    "alt": (d.get("alt") or "").strip(),
                    "_text": [],
                    "pos": len(self.links) + len(self._open_anchors),
                }
            )
        elif tag == "img":
            src = d.get("src")
            if src is not None:
                self.images.append(
                    {
                        "href": src,
                        "rel": d.get("rel") or "",
                        "alt": (d.get("alt") or "").strip(),
                        "text": "",
                        "pos": len(self.images),
                    }
                )

    def handle_startendtag(self, tag, attrs):
        if tag == "img":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title" and self._title_parts is not None:
            self.title = "".join(self._title_parts).strip()
            self._title_parts = None
            self._title_done = True
        elif tag == "a" and self._open_anchors:
            self._emit_anchor(self._open_anchors.pop())

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._title_parts is not None:
            self._title_parts.append(data)
        for a in self._open_anchors:
            a["_text"].append(data)
        s = data.strip()
        if s:
            self.text_parts.append(s)

    def _emit_anchor(self, a: dict) -> None:
        self.links.append(
            {
                "href": a["href"],
                "rel": a["rel"],
                "alt": a["alt"],
                "text": "".join(a["_text"]).strip(),
                "pos": a["pos"],
            }
        )

    def finish(self) -> None:
        self.close()
        while self._open_anchors:  # unclosed <a> at EOF still emits
            self._emit_anchor(self._open_anchors.pop(0))
        self.links.sort(key=lambda l: l["pos"])


# ---------------------------------------------------------------------
# Strict-subset fast scanner. html.parser's tokenizer machinery (goahead /
# parse_starttag / updatepos and their per-tag regex dances) is ~75% of the
# parse cost at ~27 tags/page; this scanner tokenizes the well-formed
# subset that dominates real pages with ONE compiled regex per tag and
# inlines the _PinnedExtractor state machine. Anything outside the subset
# (comments, declarations, PIs, script/style CDATA, single-quoted or
# unquoted attribute values, stray '<', malformed tags) returns None and
# the caller reruns the stdlib HTMLParser over the whole document — so the
# fast path is only ever an accelerator, never a semantics change. The
# handler logic mirrors _PinnedExtractor line for line; equivalence is
# pinned by tests/test_extract.py::test_fast_scan_matches_htmlparser
# (adversarial sweep + corpus sweep).
#
# Exactness notes vs html.parser (convert_charrefs=True):
# - inter-tag data arrives as ONE segment per '<'-gap, unescaped wholesale
#   (goahead: handle_data(unescape(rawdata[i:j]))) — replicated;
#   html.unescape is identity when '&' is absent, so it is skipped then;
# - attribute values are unquoted then unescape()d (parse_starttag) —
#   replicated, and the strict attr regex only accepts the double-quoted /
#   valueless shapes on which attrfind_tolerant parses identically;
# - tag/attr names lowercase; '/>'-ended tags go to handle_startendtag
#   (which the pinned extractor defines as img-only) — replicated.

import re as _re
from html import unescape as _unescape

_STRICT_START = _re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z][a-zA-Z0-9_:.-]*(?:=\"[^\"<>]*\")?)*)"
    r"\s*(/?)>"
)
_STRICT_END = _re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_STRICT_ATTR = _re.compile(r"([a-zA-Z][a-zA-Z0-9_:.-]*)(?:=\"([^\"<>]*)\")?")


def _fast_extract(html: str):
    """Tokenize strict-subset HTML and run the pinned extraction state
    machine inline. Returns ``(title, text_parts, links, images)`` or
    None when the document needs the full HTMLParser."""
    links: list[dict] = []
    images: list[dict] = []
    open_anchors: list[list] = []  # [href, rel, alt, text_parts, pos]
    text_parts: list[str] = []
    title = None
    title_parts = None
    title_done = False
    find = html.find
    n = len(html)
    pos = 0
    while True:
        lt = find("<", pos)
        if lt < 0:
            seg = html[pos:]
            if seg:
                if "&" in seg:
                    seg = _unescape(seg)
                if title_parts is not None:
                    title_parts.append(seg)
                for a in open_anchors:
                    a[3].append(seg)
                s = seg.strip()
                if s:
                    text_parts.append(s)
            break
        if lt > pos:
            seg = html[pos:lt]
            if "&" in seg:
                seg = _unescape(seg)
            if title_parts is not None:
                title_parts.append(seg)
            for a in open_anchors:
                a[3].append(seg)
            s = seg.strip()
            if s:
                text_parts.append(s)
        nxt = html[lt + 1 : lt + 2]
        if not nxt:
            return None  # lone '<' at EOF
        if nxt == "/":
            m = _STRICT_END.match(html, lt)
            if m is None:
                return None
            tag = m.group(1)
            if not tag.islower():
                tag = tag.lower()
            if tag == "a":
                if open_anchors:
                    a = open_anchors.pop()
                    links.append(
                        {
                            "href": a[0],
                            "rel": a[1],
                            "alt": a[2],
                            "text": "".join(a[3]).strip(),
                            "pos": a[4],
                        }
                    )
            elif tag == "title":
                if title_parts is not None:
                    title = "".join(title_parts).strip()
                    title_parts = None
                    title_done = True
            elif tag in _SKIP_TEXT_TAGS:
                return None  # CDATA content model — full parser
            pos = m.end()
            continue
        m = _STRICT_START.match(html, lt)
        if m is None:
            return None  # comment/decl/PI/stray '<'/unsupported tag shape
        tag = m.group(1)
        if not tag.islower():
            tag = tag.lower()
        if tag == "a":
            # self-closing <a/> goes to handle_startendtag, which the
            # pinned extractor defines as img-only → ignored
            if not m.group(3):
                d = {}
                rawattrs = m.group(2)
                if rawattrs:
                    for am in _STRICT_ATTR.finditer(rawattrs):
                        v = am.group(2)
                        if v and "&" in v:
                            v = _unescape(v)
                        d[am.group(1).lower()] = v
                open_anchors.append(
                    [
                        d.get("href"),
                        d.get("rel") or "",
                        (d.get("alt") or "").strip(),
                        [],
                        len(links) + len(open_anchors),
                    ]
                )
        elif tag == "img":
            d = {}
            rawattrs = m.group(2)
            if rawattrs:
                for am in _STRICT_ATTR.finditer(rawattrs):
                    v = am.group(2)
                    if v and "&" in v:
                        v = _unescape(v)
                    d[am.group(1).lower()] = v
            src = d.get("src")
            if src is not None:
                images.append(
                    {
                        "href": src,
                        "rel": d.get("rel") or "",
                        "alt": (d.get("alt") or "").strip(),
                        "text": "",
                        "pos": len(images),
                    }
                )
        elif tag == "title":
            if not m.group(3) and not title_done:
                title_parts = []
        elif tag in _SKIP_TEXT_TAGS:
            return None
        pos = m.end()
    # finish(): unclosed anchors emit in FIFO order, then sort by pos
    while open_anchors:
        a = open_anchors.pop(0)
        links.append(
            {
                "href": a[0],
                "rel": a[1],
                "alt": a[2],
                "text": "".join(a[3]).strip(),
                "pos": a[4],
            }
        )
    links.sort(key=lambda l: l["pos"])
    return title, text_parts, links, images


def decode_body(body: bytes | None, content_encoding: str | None) -> bytes:
    if body is None:
        return b""
    enc = (content_encoding or "").lower()
    try:
        if enc == "gzip":
            return gzip.decompress(body)
        if enc == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:
                return zlib.decompress(body, -zlib.MAX_WBITS)
    except (OSError, zlib.error):
        return b""
    return body


def extract_document(
    html: bytes | str | None, content_encoding: str | None = None
) -> dict:
    """Run the pinned extractor over one document. Pure, deterministic."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_body(bytes(html), content_encoding).decode(
            "utf-8", errors="replace"
        )
    elif html is None:
        html = ""
    res = None
    try:
        res = _fast_extract(html)
    except Exception:
        res = None
    if res is not None:
        title, text_parts, links, images = res
    else:
        p = _PinnedExtractor()
        try:
            p.feed(html)
            p.finish()
        except Exception:
            pass  # malformed HTML: keep whatever was extracted (lenient)
        title, text_parts, links, images = (
            p.title, p.text_parts, p.links, p.images
        )
    # drop anchors with no href — reference skips them
    links = [l for l in links if l["href"] is not None]
    for i, l in enumerate(links):
        l["pos"] = i
    return {
        "title": title,
        "text": "\n".join(text_parts),
        "links": links,
        "images": images,
    }


def expand_document(doc: dict, task: dict, base: str, expanders) -> list[dict]:
    """Run the expander list over one parsed document and canonicalize the
    emitted links — SHARED by the engine's fused extract stage and the
    reference simulator, so expander semantics are parity-tested.

    Emission order = expander order = ctx.push_links order
    (task_scheduler.rs:82-86); unparseable hrefs are dropped (Task::new parse
    failure); alt/text are trimmed (types.rs:448-449)."""
    from crusty_core_spark.functions.canonicalize import canonicalize_url_host

    out: list[dict] = []
    for exp in expanders:
        try:
            emitted = exp(doc, task)
        except Exception:
            continue  # expander errors are non-fatal (task_scheduler.rs:67-70)
        for link in emitted:
            uh = canonicalize_url_host(link.get("href"), base)
            if uh is None:
                continue
            u, host = uh
            out.append(
                {
                    "url": u,
                    "host": host,
                    "rel": link.get("rel") or "",
                    "alt": (link.get("alt") or "").strip(),
                    "text": (link.get("text") or "").strip(),
                    "target": link.get("target") or "Follow",
                    "pos": len(out),
                }
            )
    return out


def _extract_batches(
    batches: Iterator[pd.DataFrame],
    html_col: str,
    enc_col: str | None,
    canonicalize_base: str | None = None,
    expanders=None,
    user_extract=None,
    user_cols: list[str] | None = None,
    parser=None,
    *,
    emit_title: bool = True,
    emit_text: bool = True,
) -> Iterator[pd.DataFrame]:
    if expanders is None:
        from crusty_core_spark.operators.expanders import DEFAULT_EXPANDERS

        expanders = DEFAULT_EXPANDERS
    parse = parser or extract_document

    for pdf in batches:
        encs = pdf[enc_col] if enc_col and enc_col in pdf else None
        rows = [
            parse(h, encs.iloc[i] if encs is not None else None)
            for i, h in enumerate(pdf[html_col].tolist())
        ]
        out = pdf.drop(columns=[html_col])
        # title/text are skippable OUTPUTS, not skippable work: the parser
        # still extracts them (expanders/user hooks read the full doc), but
        # a consumer that never reads them (the engine with fetch_log detail
        # off) shouldn't pay their Arrow serialization — text alone is
        # ~page-text × frontier bytes per iteration
        if emit_title:
            out["title"] = pd.Series(
                [r["title"] for r in rows], dtype=object
            ).values
        if emit_text:
            out["text"] = pd.Series(
                [r["text"] for r in rows], dtype=object
            ).values
        if canonicalize_base is not None:
            bases = pdf[canonicalize_base].tolist()
            depths = pdf["depth"].tolist() if "depth" in pdf else [0] * len(rows)
            out["links_canon"] = pd.Series(
                [
                    expand_document(
                        r, {"url": b, "depth": d}, b, expanders
                    )
                    for r, b, d in zip(rows, bases, depths)
                ],
                dtype=object,
            ).values
            if user_extract is not None:
                extras = [
                    _safe_user_extract(user_extract, r, {"url": b, "depth": d})
                    for r, b, d in zip(rows, bases, depths)
                ]
                for c in user_cols or []:
                    out[c] = pd.Series(
                        [e.get(c) for e in extras], dtype=object
                    ).values
        else:
            out["links"] = pd.Series(
                [r["links"] for r in rows], dtype=object
            ).values
            out["images"] = pd.Series(
                [r["images"] for r in rows], dtype=object
            ).values
        yield out


def _safe_user_extract(fn, doc: dict, task: dict) -> dict:
    """User parser/extractor errors are non-fatal: null columns for the row."""
    try:
        return fn(doc, task) or {}
    except Exception:
        return {}


CANON_LINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("rel", T.StringType()),
            T.StructField("alt", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("target", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


def extract_pages(
    df: DataFrame, html_col: str = "html", enc_col: str | None = "content_encoding"
) -> DataFrame:
    """Vectorized parse+expand stage (the ParserProcessor analogue,
    main/src/parser_processor.rs:9-78): html → title/text/links/images columns.

    Input columns are passed through minus ``html_col`` (pruned as early as
    possible — the parse output dominates the page body downstream).
    """
    if enc_col is not None and enc_col not in df.columns:
        enc_col = None
    keep = [f for f in df.schema.fields if f.name != html_col]
    out_schema = T.StructType(list(keep) + list(EXTRACT_SCHEMA.fields))
    return df.mapInPandas(
        lambda it: _extract_batches(it, html_col, enc_col), schema=out_schema
    )


def extract_pages_canonical(
    df: DataFrame,
    base_col: str,
    html_col: str = "html",
    enc_col: str | None = "content_encoding",
    expanders=None,
    user_extract=None,
    user_schema: T.StructType | str | None = None,
    parser=None,
    emit_title: bool = True,
    emit_text: bool = True,
) -> DataFrame:
    """Fused parse + expand + canonicalize: one Python crossing.

    Emits ``links_canon`` (expander-emitted, already joined/fragment-
    stripped/sorted-params, carrying rel/alt/text/target, unparseable hrefs
    dropped) alongside title/text. ``expanders`` is the
    task_expanders::Expander list (operators/expanders.py; default
    FollowLinks). ``user_extract(doc, task) -> dict`` is the TS-analogue
    hook — its ``user_schema`` columns land on the output (and on fetch_log
    when run through the engine). ``parser`` swaps the document parser
    itself (reference ``DocumentParser<P>`` types.rs:11, exercised by
    examples/simple-custom-parser): a picklable
    ``parser(html_bytes, content_encoding) -> {"title","text","links",
    "images"}`` replacing the pinned HTML extractor — expanders and
    user_extract then run over ITS output."""
    if enc_col is not None and enc_col not in df.columns:
        enc_col = None
    if isinstance(user_schema, str):
        user_schema = T.StructType.fromDDL(user_schema)
    user_cols = [f.name for f in user_schema.fields] if user_schema else []
    keep = [f for f in df.schema.fields if f.name != html_col]
    out_schema = T.StructType(
        list(keep)
        + ([T.StructField("title", T.StringType())] if emit_title else [])
        + ([T.StructField("text", T.StringType())] if emit_text else [])
        + [T.StructField("links_canon", CANON_LINK_TYPE)]
        + (list(user_schema.fields) if user_schema else [])
    )
    return df.mapInPandas(
        lambda it: _extract_batches(
            it, html_col, enc_col, base_col, expanders, user_extract,
            user_cols, parser,
            emit_title=emit_title, emit_text=emit_text,
        ),
        schema=out_schema,
    )
