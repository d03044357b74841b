"""URL canonicalization — the engine's per-row identity function.

Semantics (superset of the reference, per BASELINE.json north_star):

- relative hrefs are joined against the parent URL
  (reference: ``parent.url.join(href)``, main/src/types.rs:438-441)
- the fragment is always stripped (main/src/types.rs:443)
- scheme and host are lowercased; host is trimmed (main/src/types.rs:195-197;
  the Rust ``url`` crate lowercases on parse)
- the default port for the scheme is elided (url crate behavior)
- query parameters are sorted by (key, value), duplicates preserved
  (north_star addition — the reference does no param sorting; both the engine
  and the fixture generator use THIS canonicalizer so goldens line up)
- empty path becomes "/"
- unparseable URLs canonicalize to NULL (reference rejects them,
  main/src/types.rs:440-441)

Scheme whitelisting (http/https only, main/src/types.rs:477-480) is a separate
predicate — see operators/filters.py — so that non-web links are observable
as filtered rows rather than silently null.

Vectorization: a pandas UDF batching over Arrow; the inner loop is plain
Python over a batch (no per-row Spark UDF crossing). Host/scheme extraction
AFTER canonicalization stays JVM-side via ``F.parse_url``.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}

import re as _re

#: RFC-3986 path characters only — anything outside (``?``/``#``, spaces,
#: control bytes, backslashes, unicode) routes to the full parser, whose
#: edge-case semantics (tab/newline stripping, escaping passthrough) the
#: fast path must never have to replicate.
_FAST_PATH_CHARS = r"[A-Za-z0-9._~!$&'()*+,;=:@/%\-]"
#: absolute-path href: "/a/b.html" — joined against a simple base by
#: plain concatenation (urljoin semantics for absolute paths)
_FAST_REL = _re.compile(rf"^/{_FAST_PATH_CHARS}*$")
#: simple canonical base: lowercase http(s), bare lowercase reg-name host
#: (no port/userinfo/IPv6), path/query/fragment irrelevant for an
#: absolute-path join
_FAST_BASE = _re.compile(r"^(https?)://([a-z0-9.-]+)(?:[/?#]|$)")
#: simple absolute href: scheme+host already lowercase, plain path, no
#: query/fragment/port/userinfo — canonical form is itself (with "/" for
#: an empty path)
_FAST_ABS = _re.compile(
    rf"^(https?)://([a-z0-9.-]+)(/{_FAST_PATH_CHARS}*)?$"
)
#: single already-canonical query param: ``k=v`` where both sides use only
#: characters that parse_qsl leaves untouched (no %-escapes, '+', '&', ';',
#: '=') AND urlencode re-emits verbatim (quote_plus safe set) — for such a
#: query, sort(parse_qsl) → urlencode is the identity, so the canonical
#: query IS the input
_FAST_QUERY = _re.compile(r"^[A-Za-z0-9_.~-]+=[A-Za-z0-9_.~-]*$")


def canonicalize_url_host(
    href: str | None, base: str | None = None
) -> tuple[str, str] | None:
    """Canonicalize and return ``(canonical_url, host)`` or None.

    The host is the one embedded in the canonical netloc — byte-identical
    to ``urlsplit(canonical_url).hostname`` (lowercased, stripped, no
    port/userinfo) without paying a second urlsplit. The fused extract
    stage re-splits every emitted link otherwise (~20 links/page — the
    second split was ~10% of the whole extract crossing).

    Fast paths: the two link shapes that dominate real crawls — an
    absolute-path href against a simple canonical base, and a simple
    absolute http(s) URL — are recognized by strict regexes and built by
    concatenation (~2 µs) instead of urljoin+urlsplit+urlunsplit
    (~15-40 µs, ~half the extract kernel's time at 20 links/page). A
    ``#fragment`` suffix is pre-stripped before matching (fragments never
    affect reference resolution and the canonical form drops them). The
    regexes only accept inputs whose canonical form is provably the
    concatenation (lowercase scheme/host, RFC-3986 path bytes, no
    query/port/userinfo); everything else falls through to the
    full parser. Output-identical by construction and pinned by
    ``tests/test_canonicalize.py::test_fast_path_matches_full_parser``."""
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    # Fragment pre-strip: the fragment never participates in reference
    # resolution (urljoin resolves path/query from the pre-'#' part and
    # carries the fragment through verbatim) and the canonical form always
    # drops it — so the fast paths may match on the pre-'#' part alone.
    # "#frag"-only hrefs (i == 0) resolve to the BASE's defragmented self;
    # that shape keeps the full parser.
    i = href.find("#")
    p = href[:i] if i > 0 else href
    # "/." excludes dot segments ("/./", "/../", trailing "/." or "/..")
    # in EITHER shape: urljoin applies remove_dot_segments, which plain
    # concatenation cannot reproduce
    if i != 0:
        # Query pre-split: a single canonical "k=v" param rides the fast
        # path verbatim (see _FAST_QUERY); any other query shape — empty
        # "?", multi-param (needs sorting), escapes — takes the full
        # parser. qpos == 0 ("?k=v" relative-query href) resolves against
        # the BASE path: full parser.
        q = ""
        qpos = p.find("?")
        if qpos > 0:
            qs = p[qpos + 1 :]
            if _FAST_QUERY.match(qs):
                q = "?" + qs
                p = p[:qpos]
            else:
                p = ""
        # trailing-';' exclusion: when a BASE is joined, urljoin's
        # urlparse→urlunparse round trip splits ';params' off the last
        # path segment and drops the ';' when params are empty
        # ("/y;" → "/y") — concatenation can't reproduce that, so such
        # paths take the full parser. (Without a base, href is never
        # urljoin'd and the ';' survives — concatenation is exact there.)
        if p:
            if p[0] == "/":
                if (
                    base is not None
                    and p[:2] != "//"
                    and "/." not in p
                    and not p.endswith(";")
                    and _FAST_REL.match(p)
                ):
                    m = _FAST_BASE.match(base)
                    if m:
                        return (
                            f"{m.group(1)}://{m.group(2)}{p}{q}",
                            m.group(2),
                        )
            elif "/." not in p and not (
                base is not None and p.endswith(";")
            ):
                m = _FAST_ABS.match(p)
                if m:
                    host = m.group(2)
                    return (
                        f"{m.group(1)}://{host}{m.group(3) or '/'}{q}",
                        host,
                    )
    return _canonicalize_full(href, base)


def _canonicalize_full(
    href: str, base: str | None
) -> tuple[str, str] | None:
    """The full urljoin/urlsplit canonicalizer (href already stripped,
    non-empty). Kept as a named function so the fast-path equivalence
    test can call it directly on inputs the fast path accepts."""
    try:
        raw = urljoin(base, href) if base else href
        parts = urlsplit(raw)
        port = parts.port  # raises ValueError on a garbage port
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").strip().lower()
    if not scheme or not host:
        return None
    netloc = host
    if port is not None and _DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{host}:{port}"
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    path = parts.path or "/"
    query = ""
    if parts.query:
        pairs = parse_qsl(parts.query, keep_blank_values=True)
        if pairs:
            query = urlencode(sorted(pairs))
        else:
            # query present but not k=v shaped (e.g. "?flag") — keep verbatim
            query = parts.query
    return urlunsplit((scheme, netloc, path, query, "")), host


def canonicalize_url(href: str | None, base: str | None = None) -> str | None:
    """Pure canonicalizer. Returns the canonical string or None."""
    res = canonicalize_url_host(href, base)
    return None if res is None else res[0]


def _canon_batch(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    out = [
        canonicalize_url(h, b if isinstance(b, str) and b else None)
        for h, b in zip(hrefs.tolist(), bases.tolist())
    ]
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.StringType())
def _canonicalize_udf(hrefs: pd.Series, bases: pd.Series) -> pd.Series:
    return _canon_batch(hrefs, bases)


def canonicalize_udf(href: Column, base: Column | None = None) -> Column:
    """Vectorized canonicalize(href, base) -> canonical url string column."""
    if base is None:
        base = F.lit(None).cast("string")
    return _canonicalize_udf(href, base)


def url_host(url: Column) -> Column:
    """Host of an already-canonical URL — JVM-side, no Python crossing."""
    return F.lower(F.trim(F.parse_url(url, F.lit("HOST"))))


def url_scheme(url: Column) -> Column:
    """Scheme of an already-canonical URL — JVM-side."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def host_hash(host: Column, n_buckets: int) -> Column:
    """Stable host bucket for partitioning/sharding — JVM-side xxhash64."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")
