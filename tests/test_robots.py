"""Robots policy table (SURVEY.md §2 gap note): banned / no-follow /
disallow-prefix / crawl-delay rules, engine vs golden model parity."""

import pytest

from x227f_spark.constants import EngineConfig, RobotsRule
from x227f_spark.model import GoldenModel
from x227f_spark.plans.rounds import CrawlEngine

ROBOTS = (
    RobotsRule(host="site2.example", banned=True),
    RobotsRule(host="site3.example", no_follow=True),
    RobotsRule(host="site1.example", disallow_prefixes=("/page2",)),
    RobotsRule(host="site4.example", crawl_delay_sec=15),  # 1 slot/round
)


@pytest.fixture(scope="module")
def cfg(corpus):
    return EngineConfig(starting_point=corpus.seed_url, fetch_cap=50,
                        robots=ROBOTS)


def test_model_respects_robots(corpus, cfg):
    m = GoldenModel(corpus, cfg)
    m.run(6)
    pids = set(m.pages)
    assert not any(p.startswith("site2.example") for p in pids), \
        "banned host crawled"
    assert "site1.example/page2.html" not in pids, "disallowed path crawled"
    # no-follow host may be crawled but contributes no edges
    if "site3.example" in m.known:
        nf_idx = m.known["site3.example"]
        assert m.links_by_src.get(nf_idx, []) == []
    # crawl-delay 15s → at most 1 site4 fetch per round
    per_round = {}
    for ev in m.trace:
        if ev.action == "fetched" and ev.host == "site4.example":
            per_round[ev.round] = per_round.get(ev.round, 0) + 1
    assert all(v <= 1 for v in per_round.values())


def test_engine_matches_model_with_robots(spark, corpus, corpus_dir, cfg,
                                          tmp_path_factory):
    golden = GoldenModel(corpus, cfg)
    golden.run(4)
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("rstate")), config=cfg)
    eng.run(4)
    assert eng.trace_events() == [
        (t.round, t.seq, t.page_id, t.host, t.action) for t in golden.trace]
    assert eng.seen_set() == golden.seen_set()
    assert eng.page_spans() == golden.page_spans()
