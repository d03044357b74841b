"""Single-threaded reference simulator — generates golden crawl fixtures.

The reference repo ships no tests and no fixtures (its examples crawl live
sites), so the "reference crawl-order and URL-seen fixtures" are produced by
this simulator, which implements the reference's documented semantics in its
only deterministic regime (concurrency=1, delay=0, jitter=0 — SURVEY.md §3.3):

- response pipeline per task (reference main/src/task_processor.rs:275-355):
  fetch → status filters (Redirect main/src/status_filters.rs:42-75,
  ContentType :16-40) → body load + size cap (task_processor.rs:60-80) →
  load filters (RobotsTxt main/src/load_filters.rs:53-112) → parse + expand
  (main/src/select_task_expanders.rs:37-51)
- candidate batch order: ctx-pushed links FIRST, then parsed links
  (main/src/task_scheduler.rs:82-86)
- scheduling chain: operators/chain.py (shared with the Spark engine)
- crawl order contract: tasks processed in task_seq order; task_seq assigned
  at scheduling time, FIFO per job; per-iteration per-host politeness budget
  of ``concurrency_per_host`` when delay_ms > 0 (reference
  main/src/task_processor.rs:388-398 re-expressed as iteration ticks)

"Fetch" is a lookup into a Common-Crawl-style ``pages`` dict (url → row with
status/location/content_type/content_encoding/html), exactly the engine's
fetch-join universe.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.functions.canonicalize import canonicalize_url
from crusty_core_spark.functions.extract import (
    decode_body,
    expand_document,
    extract_document,
)
from crusty_core_spark.operators.chain import (
    FOLLOW_TARGETS,
    ROBOTS_MARKER,
    Candidate,
    JobChainState,
    chain_decide,
)
from urllib.parse import urlsplit


@dataclass
class SimTask:
    job_id: int
    task_seq: int
    cand: Candidate
    next_fetch_iter: int = 0


@dataclass
class SimResult:
    crawl_order: list = field(default_factory=list)  # processed tasks, in order
    sched_log: list = field(default_factory=list)  # per-candidate decisions
    url_seen: dict = field(default_factory=dict)  # job_id -> sorted list
    lineage: list = field(default_factory=list)
    fetch_log: list = field(default_factory=list)
    job_log: list = field(default_factory=list)  # per-job Finished records
    n_iterations: int = 0


def _host_scheme(url: str) -> tuple[str, str]:
    p = urlsplit(url)
    return (p.hostname or "", p.scheme)


class ReferenceSimulator:
    def __init__(
        self,
        pages: dict[str, dict],
        seeds: list[tuple[int, str]],
        cfg: CrawlConfig | None = None,
        hosts: dict[str, list[str]] | None = None,
        custom_task_filters: tuple = (),
        expanders: tuple | None = None,
        user_extract=None,
        custom_status_filters: tuple = (),
        custom_load_filters: tuple = (),
        parser=None,
    ):
        self.pages = pages
        self.seeds = seeds
        self.cfg = cfg or CrawlConfig()
        #: optional DNS table host→addrs; mirrors operators/resolve.py
        self.hosts = hosts
        #: the same extension surface the engine exposes (parity-tested)
        self.custom_task_filters = tuple(custom_task_filters)
        if expanders is None:
            from crusty_core_spark.operators.expanders import DEFAULT_EXPANDERS

            expanders = DEFAULT_EXPANDERS
        self.expanders = tuple(expanders)
        self.user_extract = user_extract
        #: DocumentParser<P> analogue — same hook as CrawlEngine(parser=...);
        #: receives the RAW body + content_encoding, exactly like the engine
        self.parser = parser
        self.custom_status_filters = tuple(custom_status_filters)
        self.custom_load_filters = tuple(custom_load_filters)

    def run(self) -> SimResult:
        cfg = self.cfg
        res = SimResult()
        jobs: dict[int, JobChainState] = {}
        seq_counters: dict[int, int] = {}
        resp_counters: dict[int, int] = {}  # reference task_seq_num per job
        pending: list[SimTask] = []

        # --- job init: schedule the root task (task_scheduler.rs:119,128-132)
        for job_id, seed in self.seeds:
            root_url = canonicalize_url(seed)
            if root_url is None:
                continue
            host, scheme = _host_scheme(root_url)
            st = JobChainState(root_url=root_url, root_host=host, root_scheme=scheme)
            jobs[job_id] = st
            seq_counters[job_id] = 0
            resp_counters[job_id] = 0
            res.url_seen[job_id] = st.seen
            root = Candidate(url=root_url, host=host, depth=0, target="Follow")
            # root filtered with task_seq_num = 0 (task_scheduler.rs:128)
            action, name, scheduled = chain_decide(
                root, st, cfg, 0, cfg.user_agent, self.custom_task_filters
            )
            res.sched_log.append(
                self._sched_row(job_id, 0, root, action, name, iter_n=0)
            )
            if action == "accept":
                # seeding is iteration 0; processing starts at iteration 1
                # (matches the engine's seed()/step() convention)
                t = SimTask(job_id, seq_counters[job_id], scheduled, 1)
                seq_counters[job_id] += 1
                pending.append(t)
                res.lineage.append(
                    {
                        "job_id": job_id,
                        "url": scheduled.url,
                        "seed_url": root_url,
                        "depth": 0,
                        "discovered_by": None,
                    }
                )
            else:
                # root rejected → JobFinished(Err) (task_scheduler.rs:128-132)
                res.job_log.append(self._job_row(job_id, 0, "RootRejected",
                                                 st, resp_counters,
                                                 seq_counters))

        # --- iteration loop (the Spark batch loop analogue)
        finished: set[int] = {r["job_id"] for r in res.job_log}
        it = 1
        while pending and it <= cfg.max_iterations:
            drain = (cfg.soft_timeout_iters is not None
                     and it > cfg.soft_timeout_iters)
            ready = self._select_ready(pending, it)
            if not ready:
                it += 1
                continue
            ready_keys = {(t.job_id, t.task_seq) for t in ready}
            pending = [t for t in pending if (t.job_id, t.task_seq) not in ready_keys]
            # deterministic processing order within the batch
            ready.sort(key=lambda t: (t.job_id, t.task_seq))
            touched = {t.job_id for t in ready}
            for task in ready:
                new_tasks = self._process_response(task, jobs, seq_counters,
                                                   resp_counters, res, it,
                                                   drain=drain)
                for nt in new_tasks:
                    nt.next_fetch_iter = it + 1
                    pending.append(nt)
            # per-job Finished record (task_scheduler.rs:158-167): a touched
            # job whose frontier is now empty is complete
            still = {t.job_id for t in pending}
            for j in sorted(touched - still - finished):
                finished.add(j)
                res.job_log.append(self._job_row(
                    j, it, "SoftTimeout" if drain else "Complete",
                    jobs[j], resp_counters, seq_counters))
            it += 1
        res.n_iterations = it
        res.url_seen = {j: sorted(s.seen) for j, s in jobs.items()}
        return res

    @staticmethod
    def _job_row(job_id, it, reason, st, resp_counters, seq_counters):
        return {
            "job_id": job_id,
            "iter": it,
            "reason": reason,
            "budget_used": st.budget_used,
            "resp_counter": resp_counters.get(job_id, 0),
            "seq_counter": seq_counters.get(job_id, 0),
        }

    # ---------- politeness ready-selection ----------

    def _select_ready(self, pending: list[SimTask], it: int) -> list[SimTask]:
        ready = [t for t in pending if t.next_fetch_iter <= it]
        if self.cfg.delay_ms <= 0:
            return ready
        k = max(1, self.cfg.concurrency_per_host)
        by_host: dict[tuple[int, str], list[SimTask]] = {}
        for t in ready:
            by_host.setdefault((t.job_id, t.cand.host), []).append(t)
        out = []
        for _, ts in sorted(by_host.items()):
            ts.sort(key=lambda t: t.task_seq)
            out.extend(ts[:k])
        return out

    # ---------- response pipeline ----------

    def _process_response(
        self,
        task: SimTask,
        jobs: dict[int, JobChainState],
        seq_counters: dict[int, int],
        resp_counters: dict[int, int],
        res: SimResult,
        it: int,
        drain: bool = False,
    ) -> list[SimTask]:
        cfg = self.cfg
        job_id = task.job_id
        st = jobs[job_id]
        cand = task.cand
        resp_counters[job_id] += 1  # task_scheduler.rs:80
        parent_seq_num = resp_counters[job_id]

        page = self.pages.get(cand.url)
        pushed: list[Candidate] = []
        parsed: list[Candidate] = []
        action = "processed"
        n_links = 0
        title = None
        status = None
        resolve_failed = False
        if self.hosts is not None:
            from crusty_core_spark.operators.resolve import ip_blacklisted

            addrs = self.hosts.get(cand.host)
            usable = [a for a in addrs or [] if not ip_blacklisted(a)]
            resolve_failed = not usable
        user_extra: dict = {}
        if resolve_failed:
            action = "error:ResolveError"  # resolver.rs:72-106
        elif cand.target == "JustResolveDNS":
            action = "resolved"  # stop after resolve (task_processor.rs:285)
        elif page is None:
            action = "error:HttpError"  # fetch failure (no such row)
        else:
            status = int(page.get("status", 200))
            ctype = page.get("content_type") or ""
            # status filter: Redirect (status_filters.rs:42-75)
            if 300 <= status < 400:
                if cand.redirect >= cfg.max_redirect:
                    action = "term:MaxRedirect"
                else:
                    loc = page.get("location")
                    target_url = canonicalize_url(loc, base=cand.url) if loc else None
                    if target_url is None:
                        action = "error:BadLocation"
                    else:
                        h, _ = _host_scheme(target_url)
                        pushed.append(
                            Candidate(
                                url=target_url,
                                host=h,
                                rel="",
                                depth=cand.depth,  # assigned at Task::new below
                                redirect=cand.redirect + 1,
                                target=cand.target,
                                marker=cand.marker,  # status_filters.rs:62
                                parent_url=cand.url,
                                parent_seq=task.task_seq,
                            )
                        )
                        action = "term:Redirect"
            # status filter: ContentType (status_filters.rs:16-40)
            elif not any(a in ctype for a in cfg.accepted_content_types):
                action = "term:ContentType"
            elif cand.target == "Head":
                action = "head"  # bodyless status only (task_processor.rs:307)
            else:
                body = bytes(page.get("html") or b"")
                if len(body) > cfg.max_response_size:
                    action = "error:HttpTooBigResponse"  # task_processor.rs:66-68
                else:
                    body = decode_body(body, page.get("content_encoding"))
            # custom status filters run after the built-ins (registration
            # order, crawler.rs:108-143) — only on rows those accepted
            if action in ("processed", "head", "error:HttpTooBigResponse"):
                action = self._apply_custom_status(action, status, ctype, cand)
            if action == "processed":
                # custom load filters (post-body, pre-parse); robots rows are
                # handled by the built-in robots load filter below
                if cand.marker != ROBOTS_MARKER:
                    action = self._apply_custom_load(action, status, ctype,
                                                     body, cand)
            if action == "processed":
                    # load filter: RobotsTxt (load_filters.rs:53-112)
                    if cfg.robots_txt and cand.marker == ROBOTS_MARKER:
                        if 400 <= status < 500:
                            st.robots_rules = "User-agent: *\nAllow: /"
                            st._matcher = None
                        elif "text/plain" not in ctype.lower():
                            # quarantine: no matcher, root never re-emitted
                            # (load_filters.rs:92-94)
                            pass
                        else:
                            st.robots_rules = body.decode("utf-8", errors="replace")
                            st._matcher = None
                        if st.robots_rules is not None and st.stashed_root is not None:
                            rr = st.stashed_root
                            rr.parent_url = cand.url
                            rr.parent_seq = task.task_seq
                            pushed.append(rr)
                            st.stashed_root = None
                    # parse + expand via the SHARED expander list
                    # (select_task_expanders.rs; functions/extract.py) —
                    # skipped in soft-timeout drain mode
                    if cand.target in FOLLOW_TARGETS and not drain:
                        if self.parser is not None:
                            doc = self.parser(
                                bytes(page.get("html") or b""),
                                page.get("content_encoding"),
                            )
                        else:
                            doc = extract_document(body)
                        title = doc["title"]
                        tinfo = {"url": cand.url, "depth": cand.depth}
                        if self.user_extract is not None:
                            from crusty_core_spark.functions.extract import (
                                _safe_user_extract,
                            )

                            user_extra = _safe_user_extract(
                                self.user_extract, doc, tinfo
                            )
                        for link in expand_document(
                            doc, tinfo, cand.url, self.expanders
                        ):
                            parsed.append(
                                Candidate(
                                    url=link["url"],
                                    host=link["host"],
                                    rel=link["rel"],
                                    alt=link["alt"],
                                    text=link["text"],
                                    depth=cand.depth,
                                    redirect=0,
                                    target=link["target"],
                                    marker=0,
                                    parent_url=cand.url,
                                    parent_seq=task.task_seq,
                                )
                            )
                        n_links = len(parsed)

        res.crawl_order.append(
            {
                "job_id": job_id,
                "task_seq": task.task_seq,
                "iter": it,
                "url": cand.url,
                "depth": cand.depth,
                "redirect": cand.redirect,
                "marker": cand.marker,
                "action": action,
            }
        )
        # wire-level byte tap + response header map, the same deterministic
        # formulas as the engine (functions/http_sim.py; HttpStatus.headers
        # types.rs:233-239, LoadMetrics read/write hyper_utils.rs:14-50)
        from crusty_core_spark.functions import http_sim as HS

        headers, read_size, write_size = HS.io_metrics(
            url=cand.url,
            host=cand.host,
            user_agent=cfg.user_agent,
            resolve_failed=resolve_failed,
            target=cand.target,
            status=page.get("status") if page is not None else None,
            content_type=page.get("content_type") if page is not None else None,
            content_encoding=(
                page.get("content_encoding") if page is not None else None
            ),
            location=page.get("location") if page is not None else None,
            body_len=(
                len(bytes(page.get("html") or b"")) if page is not None else None
            ),
            accepted_content_types=cfg.accepted_content_types,
            custom_headers=cfg.custom_headers,
        )
        res.fetch_log.append(
            {
                "job_id": job_id,
                "task_seq": task.task_seq,
                "iter": it,
                "url": cand.url,
                "depth": cand.depth,
                "target": cand.target,
                "status": status,
                "action": action,
                "n_links": n_links,
                "title": title,
                "headers": headers,
                "read_size": read_size,
                "write_size": write_size,
                **user_extra,
            }
        )

        # --- schedule children (task_scheduler.rs:82-116); soft-timeout
        #     drain stops expanding (nothing is scheduled, frontier drains)
        if drain:
            return []
        batch = pushed + parsed
        out: list[SimTask] = []
        for pos, link in enumerate(batch):
            link.link_pos = pos
            # Task::new (types.rs:476-487): scheme check + level accounting
            scheme = link.url.split(":", 1)[0]
            if scheme not in ("http", "https"):
                res.sched_log.append(
                    self._sched_row(job_id, parent_seq_num, link, "rejected",
                                    "scheme", it)
                )
                continue
            depth = cand.depth if link.redirect > 0 else cand.depth + 1
            link.depth = depth
            a, name, scheduled = chain_decide(
                link, st, self.cfg, parent_seq_num, self.cfg.user_agent,
                self.custom_task_filters,
            )
            res.sched_log.append(
                self._sched_row(job_id, parent_seq_num, link, a, name, it)
            )
            if a == "term":
                break  # take_while (task_scheduler.rs:92-97)
            if a == "skip":
                continue
            t = SimTask(job_id, seq_counters[job_id], scheduled)
            seq_counters[job_id] += 1
            out.append(t)
            res.lineage.append(
                {
                    "job_id": job_id,
                    "url": scheduled.url,
                    "seed_url": st.root_url,
                    "depth": scheduled.depth,
                    "discovered_by": cand.url,
                }
            )
        return out

    def _apply_custom_status(self, action, status, ctype, cand) -> str:
        for f in self.custom_status_filters:
            try:
                v = f(status, ctype, cand.url, cand.depth)
            except Exception:
                continue  # filter errors are non-fatal (task_scheduler.rs:67-70)
            if isinstance(v, str) and v != "accept":
                return v
        return action

    def _apply_custom_load(self, action, status, ctype, body, cand) -> str:
        for f in self.custom_load_filters:
            try:
                v = f(status, ctype, body, cand.url, cand.depth)
            except Exception:
                continue
            if isinstance(v, str) and v != "accept":
                return v
        return action

    @staticmethod
    def _sched_row(job_id, parent_seq_num, cand, action, name, iter_n):
        return {
            "job_id": job_id,
            "iter": iter_n,
            "parent_seq_num": parent_seq_num,
            "url": cand.url,
            "depth": cand.depth,
            "link_pos": cand.link_pos,
            "action": action,
            "filter": name,
        }
