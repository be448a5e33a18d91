"""X4 — processed export: Spark job vs the pure-Python twin over the same
crawled state (golden model pages → both implementations → identical
dictionary-encoded vectors)."""

import pytest

from x227f_spark.constants import EngineConfig
from x227f_spark.model import GoldenModel
from x227f_spark.plans.processed import process_pages_python, save_processed
from x227f_spark.plans.rounds import CrawlEngine

ROUNDS = 5


@pytest.fixture(scope="module")
def cfg(corpus):
    return EngineConfig(starting_point=corpus.seed_url, fetch_cap=50)


def test_processed_export_matches_python_twin(spark, corpus, corpus_dir, cfg,
                                              tmp_path_factory):
    golden = GoldenModel(corpus, cfg)
    golden.run(ROUNDS)
    expected = process_pages_python(golden.pages)

    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("pstate")), config=cfg)
    eng.run(ROUNDS)
    out_dir = str(tmp_path_factory.mktemp("processed"))
    got = save_processed(spark, eng.table("pages"), out_dir)

    assert got["pages"] == expected["pages"]
    assert got["buttons"] == expected["buttons"]
    assert got["texts"] == expected["texts"]
    assert got["button_file_exts"] == expected["button_file_exts"]
    for key in ("button_names", "button_links", "button_backlinks", "links",
                "link_buttons", "link_button_alts", "link_button_titles",
                "link_button_filenames", "backlinks", "backlink_buttons"):
        assert got[key] == expected[key], key

    import json
    import os
    with open(os.path.join(out_dir, "stats.json")) as f:
        assert json.load(f)["buttons"] == len(expected["buttons"])
