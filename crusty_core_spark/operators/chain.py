"""The task-filter chain — exact serial semantics, shared by simulator & engine.

This is the one place the reference's order-dependent, stateful scheduling
semantics live. The chain order is load-bearing and mirrors the default rules
(reference main/src/crawler.rs:108-143):

    SkipNoFollowLinks                       (main/src/task_filters.rs:297-306)
    SelectiveTaskFilter(SameDomain)         (:24-47, :93-116; Follow/HeadFollow only)
    HashSetDedup(checking)                  (:181-197)
    TotalPageBudget?                        (:118-136)  — counter consumed even if a
                                            LATER filter rejects the candidate
    LinkPerPageBudget?                      (:138-160)  — resets per parent response
    PageLevel?                              (:162-179)
    RobotsTxt?                              (:215-295)  — 3-state machine; swaps the
                                            root link for /robots.txt on first pass
    [custom filters]
    HashSetDedup(committing)                (:199-211)  — a URL is "seen" only if
                                            EVERY other filter accepted it

Outcome semantics (reference main/src/task_scheduler.rs:44-76):
    Accept → next filter; all pass → schedule
    Skip   → drop candidate, continue with the next candidate
    Term   → drop candidate AND the remainder of the current batch
             (take_while, task_scheduler.rs:92-97)
    filter error → log, continue with next filter (:67-70)

Why serial code in a bulk engine: budgets + Term + dedup-commit-last interact
through mutable per-job counters (e.g. a robots-rejected candidate still
consumes a TotalPageBudget slot; an in-batch duplicate of a robots-rejected
URL is NOT deduped and consumes ANOTHER slot). This is inherently a per-job
serial fold. The engine therefore runs this chain inside
``groupBy(job_id).applyInPandas`` — exact semantics within a job, full
parallelism across jobs (at 10^10-frontier scale there are ~10^7-10^8 jobs;
per-job state is O(1) and per-job batches are budget-bounded).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

from crusty_core_spark.functions.robots import RobotsMatcher

FOLLOW_TARGETS = ("Follow", "HeadFollow")
ROBOTS_MARKER = 1  # reference task_filters.rs:213


@dataclass(slots=True)
class Candidate:
    """One link candidate entering the chain (reference rt::Task)."""

    url: str  # canonical
    host: str
    rel: str = ""
    alt: str = ""  # trimmed img/link alt (types.rs:448)
    text: str = ""  # trimmed anchor text (types.rs:449)
    depth: int = 0  # reference Task.level
    redirect: int = 0
    target: str = "Follow"
    marker: int = 0
    parent_url: str | None = None
    parent_seq: int = -1  # task_seq of the parent task (-1 for roots)
    link_pos: int = 0  # position within the parent's candidate batch
    priority: int = 0  # politeness-queue ordering key (lower = sooner)
    #: set by the engine from the bulk anti-join against the committed
    #: url_seen table (previous iterations); the simulator keeps the full
    #: set in ``st.seen`` instead, which is equivalent.
    seen_global: bool = False


@dataclass(slots=True)
class JobChainState:
    """Per-job mutable chain state (reference: the filter instances + ctx)."""

    root_url: str
    root_host: str
    root_scheme: str
    seen: set = field(default_factory=set)
    budget_used: int = 0
    lpp_seq: int = -1  # LinkPerPageBudget.current_task_seq_num
    lpp_count: int = 0  # LinkPerPageBudget.links_within_current_task
    robots_state: str = "none"  # none | requested | enabled
    robots_rules: str | None = None  # raw rules blob once known
    stashed_root: Candidate | None = None
    _matcher: RobotsMatcher | None = None

    def matcher(self) -> RobotsMatcher | None:
        if self.robots_rules is None:
            return None
        if self._matcher is None:
            self._matcher = RobotsMatcher(self.robots_rules)
        return self._matcher

    def to_row(self) -> dict:
        return {
            "root_url": self.root_url,
            "root_host": self.root_host,
            "root_scheme": self.root_scheme,
            "budget_used": self.budget_used,
            "lpp_seq": self.lpp_seq,
            "lpp_count": self.lpp_count,
            "robots_state": self.robots_state,
            "robots_rules": self.robots_rules,
            "stashed_root_url": self.stashed_root.url if self.stashed_root else None,
        }

    @staticmethod
    def from_row(row: dict) -> "JobChainState":
        st = JobChainState(
            root_url=row["root_url"],
            root_host=row["root_host"],
            root_scheme=row["root_scheme"],
            budget_used=int(row["budget_used"]),
            lpp_seq=int(row["lpp_seq"]),
            lpp_count=int(row["lpp_count"]),
            robots_state=row["robots_state"],
            robots_rules=row.get("robots_rules"),
        )
        if row.get("stashed_root_url"):
            st.stashed_root = Candidate(
                url=row["stashed_root_url"],
                host=st.root_host,
                redirect=1,  # retains root status (task_filters.rs:242-245)
                target="Follow",
                depth=0,
            )
        return st


def selective_task_filter(targets, fn, name: str | None = None):
    """Generic SelectiveTaskFilter combinator (task_filters.rs:24-47): wraps a
    user task filter so it only applies to candidates whose LinkTarget is in
    ``targets`` (e.g. ("Follow", "HeadFollow")); everything else passes.

    Use with CrawlEngine(custom_task_filters=(selective_task_filter(
    ("Follow",), my_filter),)) — exactly SelectiveTaskFilter::new(vec![...])."""
    targets = tuple(targets)

    def wrapper(cand, st):
        if cand.target not in targets:
            return "accept"
        return fn(cand, st)

    wrapper.__name__ = name or f"Selective_{getattr(fn, '__name__', 'filter')}"
    return wrapper


def _strip_www(host: str, www_allow: bool) -> str:
    if www_allow and host.startswith("www."):
        return host[4:]
    return host


def chain_decide(
    cand: Candidate,
    st: JobChainState,
    cfg,
    parent_seq_num: int,
    user_agent: str,
    custom_filters: tuple = (),
) -> tuple[str, str | None, Candidate | None]:
    """Run one candidate through the full filter chain.

    Returns (action, filter_or_reason, scheduled_candidate):
      ("accept", None, cand')  — cand' may be the robots-swapped link
      ("skip", filter_name, None)
      ("term", reason, None)   — caller must drop the REST of the batch too

    Mutates ``st`` exactly like the reference's filter instances.
    """
    # 1. SkipNoFollowLinks (task_filters.rs:297-306)
    if (cand.rel or "").lower() == "no-follow":
        return ("skip", "SkipNoFollowLinks", None)

    # 2. SameDomain, selective on Follow/HeadFollow (task_filters.rs:24-47,93-116)
    if cand.target in FOLLOW_TARGETS:
        if _strip_www(cand.host, cfg.www_allow) != _strip_www(
            st.root_host, cfg.www_allow
        ):
            return ("skip", "SameDomain", None)

    # 3. HashSetDedup checking (task_filters.rs:184-192) — union of the
    #    committed global set (engine: precomputed flag) and in-batch commits
    if cand.seen_global or cand.url in st.seen:
        return ("skip", "HashSetDedup", None)

    # 4. TotalPageBudget (task_filters.rs:118-136) — consumes even if a later
    #    filter rejects; Term once exhausted.
    if cfg.page_budget is not None:
        if st.budget_used >= cfg.page_budget:
            return ("term", "TotalPageBudget", None)
        st.budget_used += 1

    # 5. LinkPerPageBudget (task_filters.rs:138-160) — counter keyed on the
    #    parent response seq; counts only candidates that reached this filter.
    if cfg.links_per_page_budget is not None:
        if parent_seq_num > st.lpp_seq:
            st.lpp_seq = parent_seq_num
            st.lpp_count = 0
        st.lpp_count += 1
        if st.lpp_count > cfg.links_per_page_budget:
            return ("term", "LinkPerPageBudget", None)

    # 6. PageLevel (task_filters.rs:162-179)
    if cfg.max_level is not None and cand.depth >= cfg.max_level:
        return ("term", "MaxLevel", None)

    # 7. RobotsTxt (task_filters.rs:215-295)
    scheduled = cand
    if cfg.robots_txt:
        if st.robots_state == "none":
            if cand.depth != 0:
                # reference returns Err(Other) → chain continues (:220-223)
                pass
            else:
                robots_url = f"{st.root_scheme}://{st.root_host}/robots.txt"
                st.stashed_root = Candidate(
                    url=cand.url,
                    host=cand.host,
                    rel=cand.rel,
                    depth=0,
                    redirect=1,  # "treat as redirect" → keeps root status (:242-245)
                    target=cand.target,
                    marker=0,
                    parent_url=cand.parent_url,
                    parent_seq=cand.parent_seq,
                    link_pos=cand.link_pos,
                )
                scheduled = Candidate(
                    url=robots_url,
                    host=st.root_host,
                    rel="",
                    depth=0,
                    redirect=0,
                    target="Load",
                    marker=ROBOTS_MARKER,
                    parent_url=cand.parent_url,
                    parent_seq=cand.parent_seq,
                    link_pos=cand.link_pos,
                )
                st.robots_state = "requested"
        elif st.robots_state == "requested":
            if cand.marker == ROBOTS_MARKER:
                pass  # accept robots.txt itself (:256-258)
            else:
                st.robots_state = "enabled"  # (:263)
                m = st.matcher()
                if m is None or not m.allowed(user_agent, cand.url):
                    return ("skip", "RobotsTxt", None)
        else:  # enabled
            m = st.matcher()
            if m is None or not m.allowed(user_agent, cand.url):
                return ("skip", "RobotsTxt", None)

    # 8. custom filters (crawler.rs:137-139) — user extension point
    #    (task_filters::Filter analogue, SURVEY §2.9): fn(cand, st) returns
    #    "accept" | "skip" | ("term", reason); filter errors are non-fatal
    #    and continue the chain (task_scheduler.rs:67-70)
    for i, cf in enumerate(custom_filters):
        try:
            verdict = cf(scheduled, st)
        except Exception:
            continue
        if verdict == "accept" or verdict is True or verdict is None:
            continue
        if verdict == "skip" or verdict is False:
            return ("skip", f"custom:{getattr(cf, '__name__', i)}", None)
        if isinstance(verdict, tuple) and verdict[0] == "term":
            return ("term", verdict[1], None)

    # 9. HashSetDedup committing — LAST (crawler.rs:119-141, task_filters.rs:194)
    st.seen.add(scheduled.url)
    return ("accept", None, scheduled)
