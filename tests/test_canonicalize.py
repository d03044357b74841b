"""Canonicalizer unit + property tests (SURVEY.md §1.4 invariants)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crusty_core_spark.functions.canonicalize import canonicalize_url


def test_basic_normalization():
    assert (
        canonicalize_url("HTTP://WWW.Example.COM:80/a/b?z=1&a=2#frag")
        == "http://www.example.com/a/b?a=2&z=1"
    )


def test_relative_join():
    # reference joins relative hrefs against the parent (types.rs:438-441)
    assert (
        canonicalize_url("../x?b=2&a=1", "https://site.org/d/e/f")
        == "https://site.org/d/x?a=1&b=2"
    )
    assert canonicalize_url("/abs", "http://h.io/deep/path") == "http://h.io/abs"
    assert canonicalize_url("//other.com/p", "https://s.org/") == "https://other.com/p"


def test_fragment_always_stripped():
    # types.rs:443
    assert canonicalize_url("http://a.b/c#x") == "http://a.b/c"
    assert canonicalize_url("#frag", "http://a.b/c") == "http://a.b/c"


def test_default_port_elision():
    assert canonicalize_url("http://a.b:80/x") == "http://a.b/x"
    assert canonicalize_url("https://a.b:443/x") == "https://a.b/x"
    assert canonicalize_url("http://a.b:8080/x") == "http://a.b:8080/x"


def test_host_lowercased_scheme_lowercased():
    assert canonicalize_url("HtTpS://MiXeD.CaSe.IO/Path") == "https://mixed.case.io/Path"


def test_empty_path_becomes_slash():
    assert canonicalize_url("http://a.b") == "http://a.b/"


def test_query_param_sort_stable():
    assert canonicalize_url("http://a.b/?b=2&a=1&a=0") == "http://a.b/?a=0&a=1&b=2"


def test_rejects():
    assert canonicalize_url(None) is None
    assert canonicalize_url("") is None
    assert canonicalize_url("mailto:x@y.z") is None  # no host
    assert canonicalize_url("javascript:void(0)") is None
    assert canonicalize_url("http://bad:port:99999999/x") is None


def test_userinfo_preserved():
    assert canonicalize_url("http://u:p@h.io/x") == "http://u:p@h.io/x"


_url_chars = string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.-_~%"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_url_chars, max_size=80))
def test_idempotent(s):
    """canonicalize(canonicalize(x)) == canonicalize(x) for any input."""
    c1 = canonicalize_url(s)
    if c1 is not None:
        assert canonicalize_url(c1) == c1


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + string.digits + "/.-_", max_size=40)
)
def test_join_idempotent_under_base(path):
    base = "http://host.example/a/b"
    c1 = canonicalize_url(path, base)
    if c1 is not None:
        assert canonicalize_url(c1) == c1
        assert c1.startswith("http")


def test_fast_path_matches_full_parser():
    """The concatenation fast paths in canonicalize_url_host must be
    byte-identical to the full urljoin/urlsplit parser for EVERY input —
    either they produce the same output, or they must not trigger. Sweeps
    the dominant crawl shapes plus adversarial edges (dot segments,
    queries, fragments, ports, userinfo, uppercase, protocol-relative,
    controls, backslashes, unicode, params, empty/odd hosts)."""
    from crusty_core_spark.functions.canonicalize import (
        _canonicalize_full,
        canonicalize_url_host,
    )

    hrefs = [
        "/doc/123", "/", "/a/b.html", "/a;x=1", "/a:b", "/a%2Fb",
        "/a//b", "/a./b", "/.hidden", "/a/./b", "/a/../b", "/a/..",
        "/a/.", "/..", "/.", "//cdn.example/x", "/a?b=2&a=1", "/a#frag",
        "/a?b=2#f", "/a b", "/a\tb", "/a\\b", "/ü", "/a\x01b",
        "http://h.example/p", "http://h.example", "https://h.example/",
        "HTTP://h.example/p", "http://H.example/p", "http://h.example:80/p",
        "http://h.example:8080/p", "http://u@h.example/p",
        "http://u:pw@h.example/p", "http://h.example/p?x=1",
        "http://h.example/p#f", "http://h.example/a/../b",
        "http://h.example./p", "http://h.example/p;q=1",
        "http://[::1]/p", "http:///p", "http://", "ftp://h.example/f",
        "mailto:x@y", "javascript:void(0)", "page4.html", "../up",
        "./same", "a/b", "", "   ", "?q=1", "#frag", ";params",
        "http://h.example/P/Q",  # uppercase path stays
        "http://h-a.b_c.example/p",  # _ not in host class -> full parser
        # fragment pre-strip shapes (fast path matches the pre-'#' part)
        "/a#", "/a##b", "/a#f/../x", "/a#f with space", "/a#f<>",
        "#", "##", "#f#g", "/#f", "http://h.example#f",
        "http://h.example/#f", "http://h.example/p#f#g",
        "/a/.#f", "/a/..#f", "/a?x=1#f", "//cdn.example/x#f",
        # single-param query shapes (fast path carries "k=v" verbatim)
        "/a?hop=1", "/a?hop=1#f", "/a?k=", "/a?k", "/a?", "/a?k=v=w",
        "/a?k=v&", "/a?b=2&a=1", "/a?a=1&b=2", "/a?k=%20", "/a?k=+x",
        "/a?k=v;w", "/a?K=V", "/a?k.x-y~z=v.w~-_", "/a??k=v",
        "/a?k#f", "?k=v", "?k=v#f", "/a?k=v?j=w",
        "http://h.example/p?hop=2", "http://h.example?k=v",
        "http://h.example/?k=v", "http://h.example/p?b=2&a=1",
        "http://h.example/p?k=#f", "/a?=v", "/a?k==v", "/a?k&j",
        # trailing-';' shapes: urljoin drops empty params from the last
        # segment ("/y;" -> "/y") — the fast path must fall through
        "/y;", "/a;b;", "/a;;", "/a;/b", "/a;?k=v", "/a;#f",
        "http://h.example/y;", "http://h.example/a;b;",
    ]
    bases = [
        None, "http://h5.example/p/3", "https://h.example/",
        "http://h.example", "HTTP://h.example/", "http://h.example:8080/x",
        "http://u@h.example/x", "http://h.example/x?q=1",
        "notaurl", "", "ftp://h.example/x", "http://h.example/x#f",
    ]
    for base in bases:
        for href in hrefs:
            got = canonicalize_url_host(href, base)
            want = (
                _canonicalize_full(href.strip(), base)
                if href and href.strip()
                else None
            )
            assert got == want, (href, base, got, want)


def test_fast_path_random_differential():
    """Seeded random-href differential sweep: the fast path must equal the
    full parser on arbitrary character soup (this is the sweep that caught
    the trailing-';' urljoin params quirk)."""
    import random
    import string

    from crusty_core_spark.functions.canonicalize import (
        _canonicalize_full,
        canonicalize_url_host,
    )

    rnd = random.Random(98765)
    chars = string.ascii_letters + string.digits + "/?#&=._~-%+;:@!$'()*,"
    bases = [
        None, "http://h5.example/p/3", "https://h.example/",
        "http://h.example/x?q=1", "http://h.example",
    ]
    for _ in range(30000):
        href = "".join(rnd.choice(chars) for _ in range(rnd.randint(0, 24)))
        r = rnd.random()
        if r < 0.35:
            href = "/" + href
        elif r < 0.6:
            href = "http://h.example/" + href
        base = rnd.choice(bases)
        got = canonicalize_url_host(href, base)
        want = (
            _canonicalize_full(href.strip(), base) if href.strip() else None
        )
        assert got == want, (href, base, got, want)
