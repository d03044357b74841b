"""The distributed chain stage: per-job serial semantics, parallel across jobs.

``run_chain_stage`` cogroups this iteration's chain input (response rows +
candidate rows) with the per-job state table and replays the exact filter
chain (operators/chain.py) inside ``applyInPandas``. One shuffle keyed by
job_id; per-job work is O(candidates this iteration), bounded by budgets.
Scale story: at a 10^10-URL frontier there are ~10^7-10^8 jobs (domains) —
the parallelism unit is the job, exactly like the reference's
per-domain worker model (main/src/crawler.rs:382-402), minus the
shared-memory state.

The robots.txt LOAD-filter logic (reference main/src/load_filters.rs:53-112)
also lives here: it mutates per-job state (rules blob + stashed-root re-emit),
so it belongs to the same per-job serial fold.
"""

from __future__ import annotations

import pandas as pd

from crusty_core_spark.functions.extract import decode_body
from crusty_core_spark.operators.chain import (
    Candidate,
    JobChainState,
    chain_decide,
)
from crusty_core_spark.plans.schemas import CHAIN_OUT, CHAIN_OUT_COLS

_ALLOW_ALL = "User-agent: *\nAllow: /"


def _nn(v, default=None):
    """NaN/None-safe scalar."""
    if v is None:
        return default
    try:
        if pd.isna(v):
            return default
    except (TypeError, ValueError):
        pass
    return v


def _row(**kw) -> dict:
    d = dict.fromkeys(CHAIN_OUT_COLS)
    d.update(kw)
    return d


def make_chain_fn(cfg):
    user_agent = cfg.user_agent

    def fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        job_id = int(key[0])
        if len(right) == 0:
            return pd.DataFrame(columns=CHAIN_OUT_COLS)
        srow = {k: _nn(v) for k, v in right.iloc[0].to_dict().items()}
        st = JobChainState.from_row(srow)
        resp_counter = int(srow["resp_counter"])
        seq_counter = int(srow["seq_counter"])
        # in-batch dedup set; pre-seed with the robots URL if it was committed
        # in an earlier pass (it is the only in-chain-generated committed URL
        # that never appears in the bulk seen_global anti-join input)
        st.seen = set()
        if cfg.robots_txt and st.robots_state != "none":
            st.seen.add(f"{st.root_scheme}://{st.root_host}/robots.txt")

        out: list[dict] = []

        def run_batch(batch: list[Candidate], parent_seq_num: int,
                      parent_url: str | None, parent_seq: int) -> None:
            nonlocal seq_counter
            for pos, c in enumerate(batch):
                c.link_pos = pos
                scheme = c.url.split(":", 1)[0]
                if scheme not in ("http", "https"):
                    # Task::new parse rejection (types.rs:477-480)
                    out.append(_row(row_kind="sched", job_id=job_id,
                                    parent_seq_num=parent_seq_num, url=c.url,
                                    depth=c.depth, link_pos=pos,
                                    action="rejected", filter="scheme"))
                    continue
                action, name, sched = chain_decide(c, st, cfg, parent_seq_num,
                                                   user_agent)
                out.append(_row(row_kind="sched", job_id=job_id,
                                parent_seq_num=parent_seq_num, url=c.url,
                                depth=c.depth, link_pos=pos, action=action,
                                filter=name))
                if action == "term":
                    break  # take_while (task_scheduler.rs:92-97)
                if action == "skip":
                    continue
                out.append(_row(row_kind="task", job_id=job_id,
                                task_seq=seq_counter, url=sched.url,
                                host=sched.host, depth=sched.depth,
                                redirect=sched.redirect, target=sched.target,
                                marker=sched.marker, rel=sched.rel,
                                parent_url=parent_url, parent_seq=parent_seq,
                                link_pos=pos))
                out.append(_row(row_kind="lineage", job_id=job_id,
                                url=sched.url, seed_url=st.root_url,
                                depth=sched.depth, discovered_by=parent_url))
                seq_counter += 1

        if len(left):
            resps = left[left["kind"] == "resp"].sort_values("task_seq")
            cands = left[left["kind"] == "cand"]
            roots = cands[cands["task_seq"] < 0].sort_values("link_pos")
            by_parent = {
                int(s): g.sort_values("link_pos")
                for s, g in cands[cands["task_seq"] >= 0].groupby("task_seq")
            }

            # --- root scheduling (task_scheduler.rs:128-132, seq_num=0)
            for r in roots.itertuples():
                run_batch(
                    [Candidate(url=r.url, host=r.host, rel=_nn(r.rel, ""),
                               depth=int(r.depth), redirect=int(r.redirect),
                               target=r.target, marker=int(r.marker),
                               seen_global=bool(_nn(r.seen_global, False)))],
                    parent_seq_num=0, parent_url=None, parent_seq=-1,
                )

            # --- response processing in task_seq order
            for r in resps.itertuples():
                resp_counter += 1  # task_scheduler.rs:80
                psn = resp_counter
                batch: list[Candidate] = []
                # robots.txt load filter (load_filters.rs:53-112)
                if (
                    cfg.robots_txt
                    and int(r.marker) == 1
                    and r.action == "processed"
                ):
                    status = int(_nn(r.status, 0))
                    ctype = (_nn(r.content_type, "") or "").lower()
                    rules = None
                    if 400 <= status < 500:
                        rules = _ALLOW_ALL  # (:82-84)
                    elif "text/plain" not in ctype:
                        rules = None  # quarantine: no matcher, no re-emit (:92-94)
                    else:
                        body = _nn(r.body)
                        body = decode_body(
                            bytes(body) if body is not None else b"",
                            _nn(r.content_encoding),
                        )
                        rules = body.decode("utf-8", errors="replace")
                    if rules is not None:
                        st.robots_rules = rules
                        st._matcher = None
                        if st.stashed_root is not None:  # re-emit (:101-103)
                            batch.append(st.stashed_root)
                            st.stashed_root = None
                pg = by_parent.get(int(r.task_seq))
                if pg is not None:
                    for c in pg.itertuples():
                        batch.append(
                            Candidate(url=c.url, host=c.host, rel=_nn(c.rel, ""),
                                      depth=int(c.depth), redirect=int(c.redirect),
                                      target=c.target, marker=int(c.marker),
                                      seen_global=bool(_nn(c.seen_global, False)))
                        )
                run_batch(batch, psn, parent_url=r.url,
                          parent_seq=int(r.task_seq))

        new_state = st.to_row()
        out.append(_row(row_kind="state", job_id=job_id,
                        resp_counter=resp_counter, seq_counter=seq_counter,
                        **new_state))
        return pd.DataFrame(out, columns=CHAIN_OUT_COLS)

    return fn


def run_chain_stage(chain_input, job_state, cfg):
    """chain_input (CHAIN_IN rows) × job_state (JOB_STATE rows) → CHAIN_OUT."""
    return (
        chain_input.groupBy("job_id")
        .cogroup(job_state.groupBy("job_id"))
        .applyInPandas(make_chain_fn(cfg), schema=CHAIN_OUT)
    )
