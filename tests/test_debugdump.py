"""S9/T4 — debug dumps: format, ordering, atomicity (tmp file gone)."""

import os
import re

import pytest

from x227f_spark.constants import EngineConfig
from x227f_spark.plans.debugdump import dump_pagerank, dump_queue
from x227f_spark.plans.rounds import CrawlEngine

LINE = re.compile(r"^(\S+): (\d+(?:\.\d+)?(?:[eE]-?\d+)?) \((\d+)\)$")


@pytest.fixture(scope="module")
def engine(spark, corpus, corpus_dir, tmp_path_factory):
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("dumpstate")),
                      config=EngineConfig(starting_point=corpus.seed_url,
                                          fetch_cap=20))
    eng.run(4)
    return eng


def test_pagerank_dump(engine, tmp_path):
    path = str(tmp_path / "pagerank.txt")
    n = dump_pagerank(engine, path)
    assert n > 0 and os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    scores = []
    with open(path) as f:
        for line in f:
            m = LINE.match(line.rstrip("\n"))
            assert m, line
            scores.append(float(m.group(2)))
    assert n == len(scores) == engine.table("scores").count()
    assert scores == sorted(scores, reverse=True)


def test_queue_dump(engine, tmp_path):
    path = str(tmp_path / "queue.txt")
    n = dump_queue(engine, path)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
    with open(path) as f:
        urls = [line.rstrip("\n") for line in f]
    assert len(urls) == n == engine.table("queue").count()
    expected = [r["url"] for r in
                engine.table("queue").orderBy("queue_pos").collect()]
    assert urls == expected
