"""X1 — fix-images batch mode: identity re-encode is a no-op; a real
re-encode propagates new hashes into the media store and every referencing
page, preserving button order."""

import pytest

from x227f_spark import imagebytes
from x227f_spark.constants import EngineConfig
from x227f_spark.plans.fiximages import fix_images
from x227f_spark.plans.rounds import CrawlEngine


@pytest.fixture(scope="module")
def engine(spark, corpus, corpus_dir, tmp_path_factory):
    eng = CrawlEngine(spark, corpus_dir,
                      str(tmp_path_factory.mktemp("fixstate")),
                      config=EngineConfig(starting_point=corpus.seed_url,
                                          fetch_cap=50))
    eng.run(4)
    return eng


def test_identity_reencode_is_noop(spark, engine):
    pages, media = engine.table("pages"), engine.table("media")
    pages2, media2, mapping = fix_images(spark, pages, media)
    assert mapping.count() == 0
    assert media2.count() == media.count()
    before = {r["page_id"]: [b["hash"] for b in (r["buttons"] or [])]
              for r in pages.collect()}
    after = {r["page_id"]: [b["hash"] for b in (r["buttons"] or [])]
             for r in pages2.collect()}
    assert before == after


def test_reencode_propagates(spark, engine):
    pages, media = engine.table("pages"), engine.table("media")

    def reenc(data: bytes, fmt: str) -> bytes:
        # deterministic fake optimizer: re-synthesize PNGs with a new seed
        if imagebytes.guess_format(data) == "png":
            return imagebytes.make_png(88, 31, seed=999)
        return data

    pages2, media2, mapping = fix_images(spark, pages, media, reenc)
    maps = {r["old_hash"]: r["new_hash"] for r in mapping.collect()}
    assert len(maps) > 0
    new_png = imagebytes.make_png(88, 31, seed=999)
    new_hash = imagebytes.hash_image(new_png)
    assert set(maps.values()) == {new_hash}

    media_refs = {r["media_ref"] for r in media2.collect()}
    assert new_hash in media_refs
    assert not (set(maps) & media_refs), "old refs must be gone"

    # every referencing page rewired, order preserved
    for old, new in maps.items():
        rows_before = {r["page_id"]: [(b["ord"], b["hash"])
                                      for b in (r["buttons"] or [])]
                       for r in pages.collect()}
        rows_after = {r["page_id"]: [(b["ord"], b["hash"])
                                     for b in (r["buttons"] or [])]
                      for r in pages2.collect()}
        for pid, btns in rows_before.items():
            expect = [(o, maps.get(h, h)) for (o, h) in btns]
            assert rows_after[pid] == expect, pid
        break
