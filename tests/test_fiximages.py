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


def test_real_gif_reencode_through_hook(spark, engine):
    """X2 GIF branch with the REAL rewriter (imagebytes.reencode_gif via
    the format-dispatched reencode_image hook): crawled GIF buttons get
    byte-changed (forced NETSCAPE infinite loop), frames/dimensions are
    preserved, and the new hashes propagate to media + pages."""
    pages, media = engine.table("pages"), engine.table("media")
    gif_refs = {r["media_ref"]: bytes(r["bytes"])
                for r in media.collect()
                if imagebytes.guess_format(bytes(r["bytes"])) == "gif"}
    assert gif_refs, "corpus must contain gif buttons"

    pages2, media2, mapping = fix_images(spark, pages, media,
                                         imagebytes.reencode_image)
    maps = {r["old_hash"]: (r["new_hash"], r["new_file_ext"])
            for r in mapping.collect()}
    # every gif changed bytes (loop ext added); hash moved
    out = {r["media_ref"]: bytes(r["bytes"]) for r in media2.collect()}
    for old, data in gif_refs.items():
        new = imagebytes.reencode_gif(data)
        assert new != data
        assert old in maps and maps[old][0] == imagebytes.hash_image(new)
        assert maps[old][1] == "gif"
        assert out[maps[old][0]] == new
        assert imagebytes.image_dimensions(new, "gif") == (88, 31)
        assert b"NETSCAPE2.0\x03\x01\x00\x00" in new  # infinite repeat
    # referencing pages rewired to the new hashes, order preserved
    rows_before = {r["page_id"]: [(b["ord"], b["hash"])
                                  for b in (r["buttons"] or [])]
                   for r in pages.collect()}
    rows_after = {r["page_id"]: [(b["ord"], b["hash"])
                                 for b in (r["buttons"] or [])]
                  for r in pages2.collect()}
    for pid, btns in rows_before.items():
        expect = [(o, maps.get(h, (h,))[0]) for (o, h) in btns]
        assert rows_after[pid] == expect, pid


def test_real_png_recompress_through_hook(spark):
    """X2 non-identity branch with the REAL optimizer (imagebytes.
    reencode_png): a media store of deliberately suboptimal PNGs shrinks
    losslessly and hashes propagate."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(6):
        data = imagebytes.make_png(88, 31, seed=i, level=1, gradient=True)
        rows.append((imagebytes.hash_image(data), data, "png", 88, 31))
    media = spark.createDataFrame(
        rows, "media_ref string, bytes binary, file_ext string, "
              "width int, height int")
    pages = spark.createDataFrame(
        [], "page_id string, url string, last_visited timestamp, failed int, "
            "redirects_to string, internal_links array<string>, "
            "buttons array<struct<ord:int,source:string,hash:string,"
            "file_ext:string,target:string,last_visited:timestamp,"
            "alt:string,title:string>>")
    pages2, media2, mapping = fix_images(spark, pages, media,
                                         imagebytes.reencode_png)
    assert mapping.count() == 6  # every suboptimal png shrank
    out = {r["media_ref"]: bytes(r["bytes"]) for r in media2.collect()}
    for i in range(6):
        src = imagebytes.make_png(88, 31, seed=i, level=1, gradient=True)
        new = imagebytes.reencode_png(src)
        assert new != src and len(new) < len(src)
        ref = imagebytes.hash_image(new)
        assert ref in out
        assert imagebytes.png_pixels(out[ref]) == imagebytes.png_pixels(src)
        assert imagebytes.validate_image_size(out[ref]) is True
