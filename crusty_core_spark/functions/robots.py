"""robots.txt parsing + longest-match rule evaluation.

The reference delegates to the google-robotstxt port
(``robotstxt_with_cache::matcher::LongestMatchRobotsMatchStrategy``,
used at main/src/task_filters.rs:272-284 and main/src/load_filters.rs:70-101).
This module re-implements the same documented semantics (REP, RFC 9309 /
Google robots.txt spec — public knowledge):

- groups are selected by user-agent token; the group whose agent token is the
  LONGEST prefix of the product token wins; ``*`` is the fallback group
- rule patterns match against path+query; ``*`` is a wildcard, ``$`` anchors
  the end
- the longest matching pattern wins; on a priority tie, Allow wins
- an empty Disallow value allows everything
- no applicable group → allowed

Both the single-threaded simulator and the Spark engine evaluate THIS matcher
(engine side: vectorized over a pandas batch after a broadcast join of the
per-host rules blob), so fixture and engine verdicts coincide by construction.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd

_ALLOW_ALL = "User-agent: *\nAllow: /"
_UNSET = object()  # _group_cache sentinel (None is a valid cached value)


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class RobotsMatcher:
    """Parsed robots.txt rules with longest-match evaluation."""

    def __init__(self, text: str):
        self.groups: dict[str, list[tuple[str, str]]] = {}
        self._parse(text or "")
        self._regex_cache: dict[str, re.Pattern] = {}
        self._group_cache: dict[str, list[tuple[str, str]] | None] = {}

    def _parse(self, text: str) -> None:
        current_agents: list[str] = []
        last_was_agent = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not last_was_agent:
                    current_agents = []
                current_agents.append(value.lower())
                for a in current_agents:
                    self.groups.setdefault(a, [])
                last_was_agent = True
            elif key in ("allow", "disallow"):
                last_was_agent = False
                for a in current_agents:
                    self.groups.setdefault(a, []).append((key, value))
            else:
                last_was_agent = False

    def _select_group(self, user_agent: str) -> list[tuple[str, str]] | None:
        ua = user_agent.lower()
        # product token = up to first '/' (google semantics)
        token = ua.split("/", 1)[0].strip()
        best: str | None = None
        for agent in self.groups:
            if agent != "*" and token.startswith(agent):
                if best is None or len(agent) > len(best):
                    best = agent
        if best is not None:
            return self.groups[best]
        return self.groups.get("*")

    def allowed(self, user_agent: str, url: str) -> bool:
        # hot path (called once per candidate surviving to the RobotsTxt
        # filter): memoize the UA group selection, and skip the urlsplit +
        # longest-match scan outright when the group carries no non-empty
        # Disallow pattern — every branch of the scan then returns True
        # (an Allow match and the no-match fallback are both True), which
        # is the dominant allow-all case.
        group = self._group_cache.get(user_agent, _UNSET)
        if group is _UNSET:
            group = self._select_group(user_agent)
            if group is not None and not any(
                k == "disallow" and p != "" for k, p in group
            ):
                group = None  # allow-everything ≡ no group
            self._group_cache[user_agent] = group
        if group is None:
            return True
        parts = urlsplit(url)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query
        best_len = -1
        best_allow = True
        for kind, pattern in group:
            if pattern == "":
                if kind == "disallow":
                    # empty Disallow = allow all; matches nothing
                    continue
                continue
            rx = self._regex_cache.get(pattern)
            if rx is None:
                rx = _pattern_to_regex(pattern)
                self._regex_cache[pattern] = rx
            if rx.match(path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and kind == "allow"):
                    best_len = plen
                    best_allow = kind == "allow"
        return best_allow if best_len >= 0 else True


def allow_all_matcher() -> RobotsMatcher:
    """The 4xx fallback (reference main/src/load_filters.rs:64,82-84)."""
    return RobotsMatcher(_ALLOW_ALL)


def robots_allowed_batch(
    rules: pd.Series, user_agent: str, urls: pd.Series
) -> pd.Series:
    """Vectorized verdicts for a pandas batch; rules blobs repeat per host so
    matchers are cached by blob identity within the batch."""
    cache: dict[str, RobotsMatcher] = {}
    out = []
    for blob, url in zip(rules.tolist(), urls.tolist()):
        if blob is None:
            out.append(None)  # no rules known for this host (pending/quarantined)
            continue
        m = cache.get(blob)
        if m is None:
            m = RobotsMatcher(blob)
            cache[blob] = m
        out.append(m.allowed(user_agent, url))
    return pd.Series(out, dtype=object)
