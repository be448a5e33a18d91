"""StateStore: append-delta compaction and late-append commit semantics."""

import json
import os

from x227f_spark.sources.catalog import StateStore


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
