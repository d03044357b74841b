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
