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

    # S4 cbor artifact: decodes back to the identical structure
    from x227f_spark.cbor import dumps as cbor_dumps
    with open(os.path.join(out_dir, "88x31.cbor"), "rb") as f:
        raw = f.read()
    assert raw == cbor_dumps(got)
    assert _cbor_loads(raw) == json.loads(json.dumps(got))  # null ≡ None


def _cbor_loads(buf: bytes):
    """Tiny independent CBOR decoder (test-only) so the encoder isn't
    verified against itself."""
    pos = [0]

    def u(n):
        v = int.from_bytes(buf[pos[0]:pos[0] + n], "big")
        pos[0] += n
        return v

    def item():
        b = buf[pos[0]]
        pos[0] += 1
        major, info = b >> 5, b & 31
        if major < 6:
            arg = (info if info < 24
                   else u({24: 1, 25: 2, 26: 4, 27: 8}[info]))
        if major == 0:
            return arg
        if major == 1:
            return -1 - arg
        if major == 2:
            v = buf[pos[0]:pos[0] + arg]; pos[0] += arg
            return v
        if major == 3:
            v = buf[pos[0]:pos[0] + arg].decode("utf-8"); pos[0] += arg
            return v
        if major == 4:
            return [item() for _ in range(arg)]
        if major == 5:
            return {item(): item() for _ in range(arg)}
        if b == 0xF6:
            return None
        if b == 0xF5:
            return True
        if b == 0xF4:
            return False
        raise AssertionError(f"unexpected cbor byte {b:#x}")

    v = item()
    assert pos[0] == len(buf)
    return v
