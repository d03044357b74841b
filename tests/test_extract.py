"""Pinned extractor tests (select_task_expanders.rs:37-51 contract +
the byte-identical text invariant)."""

import gzip

from crusty_core_spark.functions.extract import decode_body, extract_document


def test_links_in_document_order_with_attrs():
    d = extract_document(
        b'<a href="/a" rel="NO-FOLLOW">first <b>x</b></a>'
        b'<a href="b#f" alt=" pad ">second</a>'
    )
    assert [l["href"] for l in d["links"]] == ["/a", "b#f"]
    assert d["links"][0]["rel"] == "NO-FOLLOW"  # raw attr; lowering is the filter's job
    assert d["links"][0]["text"] == "first x"  # concatenated descendant text, trimmed
    assert d["links"][1]["alt"] == "pad"  # trimmed (types.rs:448)
    assert [l["pos"] for l in d["links"]] == [0, 1]


def test_anchor_without_href_skipped():
    d = extract_document(b'<a>no href</a><a href="/x">ok</a>')
    assert [l["href"] for l in d["links"]] == ["/x"]
    assert d["links"][0]["pos"] == 0  # positions re-packed after drop


def test_first_title_only():
    d = extract_document(b"<title> One </title><title>Two</title>")
    assert d["title"] == "One"


def test_script_style_excluded_from_text():
    d = extract_document(
        b"<p>keep</p><script>var a='<a href=x>';</script><style>.c{}</style><p>also</p>"
    )
    assert d["text"] == "keep\nalso"
    assert d["links"] == []


def test_entities_decoded():
    d = extract_document(b'<a href="/x">a &amp; b</a>')
    assert d["links"][0]["text"] == "a & b"


def test_images_extracted():
    d = extract_document(b'<img src="/i.png" alt="pic"/><img alt="no src">')
    assert [i["href"] for i in d["images"]] == ["/i.png"]
    assert d["images"][0]["alt"] == "pic"


def test_unclosed_anchor_still_emitted():
    d = extract_document(b'<a href="/open">text til eof')
    assert [l["href"] for l in d["links"]] == ["/open"]


def test_gzip_body_decoded():
    raw = b"<title>zipped</title>"
    d = extract_document(gzip.compress(raw), "gzip")
    assert d["title"] == "zipped"


def test_deflate_and_garbage():
    import zlib

    assert decode_body(zlib.compress(b"x"), "deflate") == b"x"
    assert decode_body(b"not gzip", "gzip") == b""  # corrupt → empty, no raise


def test_byte_identical_stability():
    """The invariant: same bytes in → same text out, across calls."""
    body = (
        "<html><head><title>Tést</title></head><body>"
        "<h1>Héllo</h1><p>line one</p>\n<p> line two </p>"
        "</body></html>"
    ).encode("utf-8")
    t1 = extract_document(body)["text"]
    t2 = extract_document(bytes(body))["text"]
    assert t1 == t2 == "Tést\nHéllo\nline one\nline two"


def _htmlparser_reference(html, content_encoding=None):
    """The stdlib-HTMLParser path only (no fast scan) — the reference the
    strict-subset fast scanner must be byte-identical to."""
    from crusty_core_spark.functions.extract import (
        _PinnedExtractor,
        decode_body,
    )

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_body(bytes(html), content_encoding).decode(
            "utf-8", errors="replace"
        )
    elif html is None:
        html = ""
    p = _PinnedExtractor()
    try:
        p.feed(html)
        p.finish()
    except Exception:
        pass
    links = [l for l in p.links if l["href"] is not None]
    for i, l in enumerate(links):
        l["pos"] = i
    return {
        "title": p.title,
        "text": "\n".join(p.text_parts),
        "links": links,
        "images": p.images,
    }


FAST_SCAN_SWEEP = [
    b"",
    b"plain text no tags",
    b"<html><body>hi</body></html>",
    b"<a href='single-quoted'>x</a>",            # single quotes -> bail
    b"<a href=unquoted>x</a>",                   # unquoted value -> bail
    b'<a href="a&amp;b">x</a>',                  # entity in attr value
    b'<a href="a?x=1&y=2">q</a>',                # raw & in attr value
    b"text &amp; more <b>bold &lt;tag&gt;</b>",  # entities in text
    b'<a href="x">outer <a href="y">inner</a> tail</a>',  # nested anchors
    b'<a href="x">unclosed at eof',
    b'<A HREF="UPPER">c</A>',                    # uppercase tags
    b'<a  href="x"   rel="nofollow"  >spaces</a>',
    b'<img src="i.png" alt=" pad ">',
    b'<img src="i.png"/>',
    b"<br/><hr />",
    b'<a href="x" checked>flag attr</a>',
    b'<!-- comment --><a href="x">c</a>',        # comment -> bail
    b"<!DOCTYPE html><p>d</p>",                  # declaration -> bail
    b"<?php echo ?><p>d</p>",                    # PI -> bail
    b'<script>var a = \'<a href="no">\';</script><a href="yes">s</a>',
    b"<style>a { color: red }</style><p>t</p>",
    b"<title>first</title><title>second</title>",
    b"<title>a <b>bold</b> title</title>",
    b"3 < 5 and 7 > 2",                          # stray '<' -> bail
    b"a<b",
    b'<a href="x">t</a\n>',                      # whitespace in end tag
    b"</a>",                                     # end before start
    b"</>",
    b'<a href="">empty href</a>',
    b"<a>no href</a>",
    b'<a href="x#frag">frag</a>',
    b'<a href="x" href="y">dup attr (last wins)</a>',
    b"<em>e</em><strong>s</strong>",
    b"<p>line1\nline2\r\nline3</p>",
    b'<a href="x"><img src="y"></a>',
    b'<data-x foo="1">custom</data-x>',
    b'<a href="&notareal;">ent</a>',
    b"text &#65; charref",
    b"text &#x41; hexref",
    b"trailing &am",
    b"trailing &amp",
    b'<a href="x">t</a junk>',                   # junk in end tag -> bail
    b'<a href="x"\n   rel="r">multi-line attrs</a>',
    b'<a\thref="tab">t</a>',
    b'<a href="x">a</a><a href="y">b</a><a href="z">c</a>',
    b'\xff\xfe garbage <a href="x">g</a>',       # invalid utf-8 (replaced)
    b'<a href="x&quot;y">quoted-ent</a>',
    b'<a rel="no-follow" href="x">r</a>',
    b'<svg><path d="M0,0"/></svg>',
    b'<a href="x" ="bare">weird attr</a>',       # malformed attr -> bail
    b"<a",                                       # incomplete tag at EOF
    b"<",                                        # lone '<' at EOF
    b'<a/ href="x">slash before attr</a>',       # bail shape
    b"<title>&amp;</title>",
]


def test_fast_scan_matches_htmlparser():
    """The strict-subset fast scanner must be byte-identical to the stdlib
    HTMLParser path for EVERY input — either it produces the same output
    or it must bail to the full parser. Adversarial sweep + corpus sweep."""
    for doc in FAST_SCAN_SWEEP:
        assert extract_document(doc) == _htmlparser_reference(doc), doc

    from crusty_core_spark.sources.datagen import CorpusSpec, gen_page_row

    spec = CorpusSpec(
        n_hosts=40, base_pages_per_host=30, links_per_page=20,
        words_per_page=120, zipf_hot_host_factor=4, seed=7,
    )
    n_checked = 0
    for hi in range(spec.n_hosts):
        for pi in range(spec.pages_per_host(hi)):
            for r in gen_page_row(spec, hi, pi):
                if r["html"]:
                    assert extract_document(
                        r["html"], r["content_encoding"]
                    ) == _htmlparser_reference(
                        r["html"], r["content_encoding"]
                    ), r["url"]
                    n_checked += 1
    assert n_checked > 500


def test_fast_scan_accepts_corpus_shape():
    """The corpus page shape must actually take the fast path (guards the
    accelerator against silently bailing on its target workload)."""
    from crusty_core_spark.functions.extract import _fast_extract

    html = (
        '<html><head><title>T</title></head><body>\n<h1>T</h1>\n'
        '<p>w1 w2</p>\n<img src="/static/i.png" alt="pic 0">\n'
        '<a href="/page/p3">link 0</a>\n'
        '<a href="/page/p4#section-1" rel="no-follow">link 1</a>\n'
        "</body></html>"
    )
    res = _fast_extract(html)
    assert res is not None
    title, text_parts, links, images = res
    assert title == "T"
    assert [l["href"] for l in links] == ["/page/p3", "/page/p4#section-1"]
    assert len(images) == 1
