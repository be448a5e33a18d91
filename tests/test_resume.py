"""P5 — checkpoint/resume and partition-count invariance.

- resume: kill after round k (drop the engine object), build a fresh engine
  on the same state dir, finish the crawl → identical final state vs an
  uninterrupted run.
- invariance: the same crawl at different shuffle-partition counts produces
  byte-identical ordering/state (SURVEY.md §4 determinism discipline).
"""

import pytest

from x227f_spark.constants import EngineConfig
from x227f_spark.plans.rounds import CrawlEngine

ROUNDS = 4


@pytest.fixture(scope="module")
def cfg(corpus):
    return EngineConfig(starting_point=corpus.seed_url, fetch_cap=50)


@pytest.fixture(scope="module")
def baseline(spark, corpus_dir, cfg, tmp_path_factory):
    eng = CrawlEngine(spark, corpus_dir, str(tmp_path_factory.mktemp("base")),
                      config=cfg)
    eng.run(ROUNDS)
    return eng


def test_resume_mid_crawl(spark, corpus_dir, cfg, tmp_path_factory, baseline):
    state = str(tmp_path_factory.mktemp("resume"))
    eng1 = CrawlEngine(spark, corpus_dir, state, config=cfg)
    eng1.run(2)
    del eng1  # "crash": all in-memory state dropped
    eng2 = CrawlEngine(spark, corpus_dir, state, config=cfg)
    assert eng2.store.round == 2  # resumed from the committed checkpoint
    eng2.run(ROUNDS - 2)
    assert eng2.trace_events() == baseline.trace_events()
    assert eng2.seen_set() == baseline.seen_set()
    assert eng2.page_spans() == baseline.page_spans()


def test_partition_invariance(spark, corpus_dir, cfg, tmp_path_factory,
                              baseline):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        eng = CrawlEngine(spark, corpus_dir, str(tmp_path_factory.mktemp("p3")),
                          config=cfg)
        eng.run(ROUNDS)
        assert eng.trace_events() == baseline.trace_events()
        assert eng.seen_set() == baseline.seen_set()
        assert eng.page_spans() == baseline.page_spans()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
