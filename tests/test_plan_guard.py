"""Regression guard for the round-1 plan-string blowup (BENCH_r01: 120 MB
plan strings stringified by the driver every crawl round).

Every heavily re-referenced round intermediate must be lineage-cut
(CrawlEngine._cut); without the cuts the commit plan re-embeds the
fetch/extract subtree hundreds of times and Catalyst/stringification become
a serial driver bottleneck that no cluster size fixes. The guard runs a
short crawl with X227F_PLAN_GUARD=1 and asserts the largest committed-table
plan stays far below Spark's 2 MB truncation threshold after several rounds
of state growth.
"""

import time

from dataclasses import replace

from x227f_spark.constants import EngineConfig
from x227f_spark.plans.rounds import CrawlEngine
from x227f_spark.sources.catalog import StateStore

ROUNDS = 2 * StateStore.COMPACT_AT + 1  # two merge-compaction boundaries
MAX_PLAN_CHARS = 1_000_000


def test_round_plans_stay_bounded(spark, corpus, corpus_dir,
                                  tmp_path_factory, monkeypatch):
    """17 rounds (two COMPACT_AT=8 compaction cycles) under recrawl
    pressure: plan strings AND per-round wall time must stay flat across
    compaction boundaries — the merge-on-read delta stack grows to
    COMPACT_AT and must reset, not compound."""
    monkeypatch.setenv("X227F_PLAN_GUARD", "1")
    cfg = replace(EngineConfig(starting_point=corpus.seed_url, fetch_cap=50),
                  recrawl_hours=0, recrawl_popular_hours=0)
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("plan_guard_state")),
                      config=cfg)
    lens, secs = [], []
    for _ in range(ROUNDS):
        t0 = time.monotonic()
        eng.run_round()
        secs.append(time.monotonic() - t0)
        lens.append(eng.last_plan_len)
    assert lens[-1] > 0  # the guard actually measured something
    assert max(lens) < MAX_PLAN_CHARS, lens
    # plan size must not compound across compaction cycles: the second
    # cycle's peak stays within jitter of the first cycle's peak
    c1 = max(lens[1:StateStore.COMPACT_AT])
    c2 = max(lens[StateStore.COMPACT_AT + 1:])
    assert c2 < 1.3 * c1, lens
    # wall time flat across cycles (loose: CI noise, JIT warm-up in cycle 1)
    cyc1 = sorted(secs[2:StateStore.COMPACT_AT])
    cyc2 = sorted(secs[StateStore.COMPACT_AT + 1:])
    med1 = cyc1[len(cyc1) // 2]
    med2 = cyc2[len(cyc2) // 2]
    assert med2 < 2.0 * med1, secs
