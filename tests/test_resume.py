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


def test_reconcile_keeps_max_pos_monotone(spark, corpus_dir, cfg,
                                          tmp_path_factory):
    """_max_pos's contract is "max position ever assigned" — when the
    highest-position queue row has been consumed, the committed queue's
    max(queue_pos) is LOWER than the true high-water mark, and
    reconciliation must NOT regress to it (reused positions would break
    uniqueness over crawl history). queue_len, by contrast, is re-derived
    from the committed table."""
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("rq")), config=cfg)
    eng.run_round()
    eng.run_round()
    hwm = eng._max_pos
    assert hwm >= 0
    # simulate drift: an over-counted queue_len gets corrected; a committed
    # max below the high-water mark does not drag _max_pos down
    eng._queue_len += 7
    eng._reconcile_queue_stats()
    qn = eng.table("queue").count()
    assert eng._queue_len == qn
    assert eng._max_pos == hwm
    # an UNDER-counted _max_pos (lost Observation) is repaired upward to
    # at least the committed maximum
    from pyspark.sql import functions as F
    row = eng.table("queue").agg(F.max("queue_pos").alias("mx")).first()
    committed_mx = row["mx"] if row["mx"] is not None else -1
    eng._max_pos = -1
    eng._reconcile_queue_stats()
    assert eng._max_pos == committed_mx
