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
