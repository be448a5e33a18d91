"""J6 — unlinked-media GC (garbagecollect.rs:7-43): anti-join delete set,
executor-side deletes by default, driver name-list contract on demand."""

import os

from x227f_spark.plans.gc import gc_media_dir


def _pages(spark):
    return spark.createDataFrame(
        [([("aa", "png")],), ([("cc", "gif")],)],
        "buttons array<struct<hash:string,file_ext:string>>")


def _mk(media_dir, names):
    os.makedirs(media_dir, exist_ok=True)
    for n in names:
        with open(os.path.join(media_dir, n), "wb") as f:
            f.write(b"x")


def test_gc_media_dir_names_contract(spark, tmp_path):
    d = str(tmp_path / "m1")
    _mk(d, ["aa.png", "cc.gif", "zz.png", "yy.gif"])
    deleted = gc_media_dir(spark, _pages(spark), d, return_names=True)
    assert deleted == ["yy.gif", "zz.png"]
    assert sorted(os.listdir(d)) == ["aa.png", "cc.gif"]


def test_gc_media_dir_executor_side_default(spark, tmp_path):
    """Default flavor: no driver-side list — deletes happen in
    foreachPartition; linked files survive, unlinked are gone."""
    d = str(tmp_path / "m2")
    _mk(d, ["aa.png", "cc.gif", "zz.png"])
    out = gc_media_dir(spark, _pages(spark), d)
    assert out == []
    assert sorted(os.listdir(d)) == ["aa.png", "cc.gif"]
