"""Engine table schemas (SURVEY.md §1.1 mapping of the reference structs)."""

FRONTIER = (
    "job_id long, task_seq long, url string, host string, depth int, "
    "redirect int, target string, marker int, rel string, alt string, "
    "text string, parent_url string, "
    "parent_seq long, link_pos int, priority int, next_fetch_iter long, "
    "added_iter long"
)

JOB_STATE = (
    "job_id long, root_url string, root_host string, root_scheme string, "
    "budget_used long, lpp_seq long, lpp_count long, robots_state string, "
    "robots_rules string, stashed_root_url string, resp_counter long, "
    "seq_counter long"
)

URL_SEEN = "job_id long, url string, added_iter long"

FETCH_LOG = (
    "iter long, job_id long, task_seq long, url string, depth int, "
    "redirect int, target string, marker int, status int, action string, "
    "n_links int, title string, bytes long, wait_iters long, "
    # HttpStatus.headers (types.rs:233-239; HeaderMap types.rs:212-231 is
    # HashMap<String, Vec<String>> — multi-valued, hence array values) +
    # LoadMetrics read/write byte tap (types.rs:248-253, hyper_utils.rs
    # CountingStream) — deterministic simulated values, shared formulas in
    # functions/http_sim.py
    "headers map<string,array<string>>, read_size long, write_size long"
)

JOB_LOG = (
    "job_id long, iter long, reason string, budget_used long, "
    "resp_counter long, seq_counter long"
)

SCHED_LOG = (
    "iter long, job_id long, parent_seq_num long, url string, depth int, "
    "link_pos int, action string, filter string"
)

LINEAGE = (
    "job_id long, url string, seed_url string, depth int, "
    "discovered_by string, iter long"
)

METRICS = (
    "iter long, n_ready long, n_processed long, n_errors long, "
    "n_candidates long, n_accepted long, n_skipped long, n_terminated long, "
    # wire byte tap per iteration (hyper_utils.rs Stats read/write)
    "bytes_fetched long, bytes_sent long, wall_ms long, "
    # dedup-backstop scan accounting: shards whose url_seen partitions were
    # read this iteration and the bytes scanned — the O(new-work) evidence
    # (stays flat as history grows instead of tracking total crawled)
    "dedup_shards_read long, dedup_read_bytes long, "
    # which execution path ran the iteration (1 = driver-local fast path,
    # 0 = distributed plan) — makes throughput numbers attributable
    "exec_local int"
)

# chain-stage exchange schemas (operators/chain_stage.py).
# ``pre_action`` (counts-only mode): a stateless verdict — "rejected"
# (scheme) or "skip" (no-follow / committed-seen) — precomputed JVM-side in
# engine.step; rows carrying it have their string payload (url/host/rel/
# alt/text) nulled before the cogroup exchange and short-circuit the fold
# (chain_stage.run_batch). Null pre_action = run the full chain_decide.
# resp-kind rows are likewise slimmed at the source (engine.step): the fold
# reads only url/task_seq/marker/action/status plus content_type/
# content_encoding/body on robots (marker==1) rows, so host/rel/alt/text/
# target arrive null for resps — pure shuffle-byte savings.
CHAIN_IN = (
    "job_id long, kind string, task_seq long, link_pos int, url string, "
    "host string, rel string, alt string, text string, depth int, "
    "redirect int, target string, "
    "marker int, seen_global boolean, status int, content_type string, "
    "content_encoding string, body binary, action string, pre_action string"
)

CHAIN_OUT = (
    "row_kind string, job_id long, task_seq long, url string, host string, "
    "depth int, redirect int, target string, marker int, rel string, "
    "alt string, text string, "
    "parent_url string, parent_seq long, link_pos int, priority int, action string, "
    "filter string, parent_seq_num long, "
    "root_url string, root_host string, root_scheme string, "
    "budget_used long, lpp_seq long, lpp_count long, robots_state string, "
    "robots_rules string, stashed_root_url string, resp_counter long, "
    "seq_counter long, seed_url string, discovered_by string"
)

CHAIN_OUT_COLS = [c.strip().split(" ")[0] for c in CHAIN_OUT.split(",")]
