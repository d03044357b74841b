"""Pluggable status/load filter helpers (status_filters / load_filters).

The reference exposes three pluggable filter families
(main/src/task_filters.rs:9-22, status_filters.rs:9-14, load_filters.rs:8-19);
task filters live in operators/chain.py (chain_decide + selective_task_filter).
This module holds the status/load side:

- a custom STATUS filter is a picklable
  ``fn(status, content_type, url, depth) -> None | "term:X" | "error:X"``,
  run after the built-in Redirect/ContentType status filters;
- a custom LOAD filter is a picklable
  ``fn(status, content_type, body: bytes, url, depth) -> None | "term:X"``,
  run after the body loaded (and decompressed), before parse.

Pass them to ``CrawlEngine(custom_status_filters=..., custom_load_filters=...)``
and to ``ReferenceSimulator(...)`` — both run the identical list, so the
parity suite covers custom filters too.
"""

from __future__ import annotations


def load_content_type(accepted: tuple[str, ...]):
    """The optional post-body ``load_filters::ContentType``
    (main/src/load_filters.rs:21-51): terminate AFTER the load when the
    response content-type matches none of ``accepted`` — distinct from the
    pre-body status-filter ContentType, which the engine always applies."""
    accepted = tuple(accepted)

    def f(status, content_type, body, url, depth):
        ct = content_type or ""
        if not any(a in ct for a in accepted):
            return "term:LoadContentType"
        return None

    f.__name__ = "load_content_type"
    return f


def status_code_range(lo: int, hi: int, reason: str = "StatusRange"):
    """Example custom status filter: terminate on codes outside [lo, hi]."""

    def f(status, content_type, url, depth):
        if status is not None and not (lo <= int(status) <= hi):
            return f"term:{reason}"
        return None

    f.__name__ = "status_code_range"
    return f
