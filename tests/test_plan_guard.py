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

import os

import pytest

from x227f_spark.constants import EngineConfig
from x227f_spark.plans.rounds import CrawlEngine

ROUNDS = 5
MAX_PLAN_CHARS = 1_000_000


def test_round_plans_stay_bounded(spark, corpus, corpus_dir,
                                  tmp_path_factory, monkeypatch):
    monkeypatch.setenv("X227F_PLAN_GUARD", "1")
    cfg = EngineConfig(starting_point=corpus.seed_url, fetch_cap=50)
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("plan_guard_state")),
                      config=cfg)
    lens = []
    for _ in range(ROUNDS):
        eng.run_round()
        lens.append(eng.last_plan_len)
    assert lens[-1] > 0  # the guard actually measured something
    assert max(lens) < MAX_PLAN_CHARS, lens
    # plans must not grow round-over-round (state size must not leak into
    # plan shape) — allow small jitter from alias numbering
    assert lens[-1] < 1.2 * lens[1], lens
