"""StateStore: append-delta compaction and late-append commit semantics."""

import json
import os

import pytest

from x227f_spark.sources.catalog import MergeDelta, StateStore


def test_append_compaction_bounds_delta_dirs(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "st"))
    n_rounds = StateStore.COMPACT_AT + 3
    for r in range(1, n_rounds + 1):
        df = spark.createDataFrame([(r, f"k{r}")], "round int, key string")
        store.commit(r, {}, {"t": df})
    # read sees every appended row exactly once
    rows = {(x["round"], x["key"]) for x in store.read("t").collect()}
    assert rows == {(r, f"k{r}") for r in range(1, n_rounds + 1)}
    # delta dir count is bounded (compacted at COMPACT_AT)
    assert len(store._append["t"]) < StateStore.COMPACT_AT
    on_disk = [d for d in os.listdir(tmp_path / "st" / "tables" / "t")
               if d.startswith("v")]
    assert len(on_disk) == len(store._append["t"])

    # a fresh store resumes from the compacted checkpoint identically
    store2 = StateStore(spark, str(tmp_path / "st"))
    rows2 = {(x["round"], x["key"]) for x in store2.read("t").collect()}
    assert rows2 == rows


def test_late_append_commits_atomically(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "st2"))
    base = spark.createDataFrame([(1, "a")], "round int, key string")

    def late():
        return {"metrics": spark.createDataFrame([(1, 42)],
                                                 "round int, n int")}

    store.commit(1, {"cow_t": base}, {}, late_append=late)
    assert store.read("metrics").collect()[0]["n"] == 42
    with open(os.path.join(str(tmp_path / "st2"), "CHECKPOINT")) as f:
        ck = json.load(f)
    assert "metrics" in ck["append"]  # same atomic pointer flip


def test_cow_to_merge_migration_keeps_rows(spark, tmp_path):
    """Resuming a cow-format checkpoint and committing the table's first
    MergeDelta must adopt the cow version as the merge base (P5 across the
    format change) — not drop the pre-existing rows."""
    root = str(tmp_path / "st3")
    store = StateStore(spark, root)
    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "page_id string, n int")
    store.commit(1, {"pages": old})  # cow-format commit, as the old engine

    # fresh store = crash-resume on the new (merge-format) engine
    store2 = StateStore(spark, root)
    upd = spark.createDataFrame([("b", 20), ("d", 4)], "page_id string, n int")
    dels = spark.createDataFrame([("c",)], "page_id string")
    store2.commit(2, {}, merge={
        "pages": MergeDelta(rows=upd, keys=["page_id"], dels=dels)})

    rows = {(r["page_id"], r["n"]) for r in store2.read("pages").collect()}
    assert rows == {("a", 1), ("b", 20), ("d", 4)}
    # the checkpoint no longer lists pages as cow (single-mode invariant)
    with open(os.path.join(root, "CHECKPOINT")) as f:
        ck = json.load(f)
    assert "pages" not in ck["cow"] and "pages" in ck["merge"]

    # and a third resume still reads the merged view
    store3 = StateStore(spark, root)
    rows3 = {(r["page_id"], r["n"]) for r in store3.read("pages").collect()}
    assert rows3 == rows


def test_mixed_mode_checkpoint_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "st4")
    store = StateStore(spark, root)
    df = spark.createDataFrame([("a", 1)], "page_id string, n int")
    store.commit(1, {"pages": df})
    with open(os.path.join(root, "CHECKPOINT")) as f:
        ck = json.load(f)
    ck["merge"]["pages"] = {"base": None, "deltas": [], "keys": ["page_id"]}
    with open(os.path.join(root, "CHECKPOINT"), "w") as f:
        json.dump(ck, f)
    with pytest.raises(ValueError, match="both cow and merge"):
        StateStore(spark, root)


def test_fold_pool_rejects_same_table_in_two_jobs(spark, tmp_path):
    """The parallel fold pool's safety argument is per-table version
    allocation — two concurrent jobs for ONE table would race the version
    scan. The engine never schedules that (append and merge tables are
    disjoint), but the store itself doesn't forbid committing one name in
    both modes; the round whose compaction AND fold both target it must
    fail loudly instead of racing."""
    store = StateStore(spark, str(tmp_path / "stf"))
    # drop the fold-size floor so KB-sized deltas absorb every round, the
    # regime this race test needs (production keeps the r7 floor)
    os.environ["X227F_MIN_FOLD_BYTES"] = "0"
    try:
        def df(r):
            return spark.createDataFrame(
                [(r, f"k{r}")], "round int, key string")

        with pytest.raises(AssertionError, match="unique table names"):
            # merge deltas fold every round here (delta size ≈ base size),
            # so the commit crossing COMPACT_AT appends schedules both jobs
            for r in range(1, StateStore.COMPACT_AT + 2):
                store.commit(r, {}, {"t": df(r)},
                             merge={"t": MergeDelta(df(r), ["key"])})
    finally:
        del os.environ["X227F_MIN_FOLD_BYTES"]


def test_commit_falls_back_to_serial_on_unmaterialized_cache(
        spark, tmp_path, caplog):
    """The bounded write pool requires every shared staged input to be
    materialized; a staged plan still referencing a lazy cache must drop
    the commit to serial writes (enforced, not comment discipline) and
    still commit correctly."""
    import logging

    store = StateStore(spark, str(tmp_path / "stc"))
    base = spark.range(100).selectExpr("id as k", "id * 2 as v").persist()
    try:
        a = base.where("k % 2 = 0")
        b = base.where("k % 2 = 1")
        with caplog.at_level(logging.WARNING,
                             logger="x227f_spark.sources.catalog"):
            store.commit(1, {"a": a, "b": b})
        assert any("unmaterialized cache" in r.message
                   for r in caplog.records)
        assert store.read("a").count() + store.read("b").count() == 100
        # once the cache is materialized the pool-safe check passes silently
        base.count()
        caplog.clear()
        with caplog.at_level(logging.WARNING,
                             logger="x227f_spark.sources.catalog"):
            store.commit(2, {"a2": a})
        assert not any("unmaterialized cache" in r.message
                       for r in caplog.records)
    finally:
        base.unpersist()
