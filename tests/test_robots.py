"""robots.txt matcher tests — longest-match REP semantics
(reference crate: google-robotstxt port, task_filters.rs:87)."""

from crusty_core_spark.functions.robots import RobotsMatcher, allow_all_matcher


def m(text):
    return RobotsMatcher(text)


def test_basic_disallow():
    r = m("User-agent: *\nDisallow: /private/\nAllow: /\n")
    assert r.allowed("bot/1.0", "http://h/x")
    assert not r.allowed("bot/1.0", "http://h/private/x")


def test_longest_match_wins():
    r = m("User-agent: *\nDisallow: /a/\nAllow: /a/b/\n")
    assert not r.allowed("bot", "http://h/a/x")
    assert r.allowed("bot", "http://h/a/b/c")  # longer Allow beats Disallow


def test_allow_wins_ties():
    r = m("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n")
    assert r.allowed("bot", "http://h/dir/x")


def test_wildcard_and_anchor():
    r = m("User-agent: *\nDisallow: /*.pdf$\n")
    assert not r.allowed("bot", "http://h/a/doc.pdf")
    assert r.allowed("bot", "http://h/a/doc.pdfx")
    r2 = m("User-agent: *\nDisallow: /a*b\n")
    assert not r2.allowed("bot", "http://h/aXXb/c")


def test_agent_group_selection():
    r = m(
        "User-agent: special\nDisallow: /\n\n"
        "User-agent: *\nAllow: /\n"
    )
    assert not r.allowed("special/2.0", "http://h/x")
    assert r.allowed("other/1.0", "http://h/x")


def test_grouped_agents_share_rules():
    r = m("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert not r.allowed("a", "http://h/x")
    assert not r.allowed("b", "http://h/x")


def test_empty_disallow_allows_all():
    r = m("User-agent: *\nDisallow:\n")
    assert r.allowed("bot", "http://h/anything")


def test_no_rules_allows():
    assert m("").allowed("bot", "http://h/x")
    assert m("# just a comment").allowed("bot", "http://h/x")


def test_query_included_in_match():
    r = m("User-agent: *\nDisallow: /search?q=\n")
    assert not r.allowed("bot", "http://h/search?q=x")
    assert r.allowed("bot", "http://h/search")


def test_allow_all_fallback():
    # the 4xx robots case (load_filters.rs:82-84)
    r = allow_all_matcher()
    assert r.allowed("bot", "http://h/private/x")
