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
