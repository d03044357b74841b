"""DNS hosts-table + IP-blacklist stage: unit + engine/simulator parity."""

from crusty_core_spark.config import CrawlConfig
from crusty_core_spark.operators.resolve import ip_blacklisted
from crusty_core_spark.plans.engine import CrawlEngine
from crusty_core_spark.simulator import ReferenceSimulator
from crusty_core_spark.sources.datagen import CorpusSpec, gen_corpus, gen_hosts

from tests.conftest import pages_df


def test_blacklist_ranges():
    for bad in ["10.1.2.3", "192.168.0.1", "127.0.0.1", "169.254.9.9",
                "224.0.0.5", "0.0.0.0", "not-an-ip"]:
        assert ip_blacklisted(bad), bad
    for ok in ["93.184.216.34", "8.8.8.8", "203.0.114.1"]:
        assert not ip_blacklisted(ok), ok


def test_parity_with_hosts_table(spark, workdir):
    spec = CorpusSpec(n_hosts=8, base_pages_per_host=8, seed=31)
    rows, seeds = gen_corpus(spec)
    hosts_rows = gen_hosts(spec)
    hosts = {r["host"]: r["addrs"] for r in hosts_rows}
    # some hosts must actually fail resolution for this test to bite
    assert any(
        all(ip_blacklisted(a) for a in r["addrs"]) for r in hosts_rows
    )

    sim = ReferenceSimulator(
        {r["url"]: r for r in rows}, seeds, CrawlConfig(), hosts=hosts
    ).run()
    hosts_df = spark.createDataFrame(
        [(r["host"], r["addrs"]) for r in hosts_rows],
        "host string, addrs array<string>",
    )
    eng = CrawlEngine(spark, pages_df(spark, rows), workdir, CrawlConfig(),
                      hosts=hosts_df)
    eng.seed(seeds)
    eng.run()

    order_e = sorted(
        (r.iter, r.job_id, r.task_seq, r.url, r.action)
        for r in eng.io.read("fetch_log").collect()
    )
    order_s = sorted(
        (r["iter"], r["job_id"], r["task_seq"], r["url"], r["action"])
        for r in sim.crawl_order
    )
    assert order_e == order_s
    assert any(a == "error:ResolveError" for *_, a in order_e)


def test_resolver_stage_parity(spark, workdir):
    """A point resolver (Resolver trait analogue) must reproduce the hosts
    dim table's crawl exactly — distributed resolver_stage AND the
    driver-local path's cached resolver, against the same simulator run."""
    import tempfile

    spec = CorpusSpec(n_hosts=8, base_pages_per_host=8, seed=31)
    rows, seeds = gen_corpus(spec)
    hosts_rows = gen_hosts(spec)
    hosts = {r["host"]: r["addrs"] for r in hosts_rows}
    sim = ReferenceSimulator(
        {r["url"]: r for r in rows}, seeds, CrawlConfig(), hosts=hosts
    ).run()
    order_s = sorted(
        (r["iter"], r["job_id"], r["task_seq"], r["url"], r["action"])
        for r in sim.crawl_order
    )
    assert any(a == "error:ResolveError" for *_, a in order_s)

    def resolver(host):  # picklable module-level-free closure via defaults
        return hosts.get(host)

    # distributed plan (local path disabled, thr=0) and hybrid default
    for thr in (0, 20000):
        cfg = CrawlConfig(local_iter_threshold=thr)
        wd = tempfile.mkdtemp(dir=workdir)
        eng = CrawlEngine(spark, pages_df(spark, rows), wd, cfg,
                          resolver=resolver)
        eng.seed(seeds)
        eng.run()
        order_e = sorted(
            (r.iter, r.job_id, r.task_seq, r.url, r.action)
            for r in eng.io.read("fetch_log").collect()
        )
        assert order_e == order_s, f"thr={thr}"
