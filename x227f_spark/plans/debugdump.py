"""S9/T4 — debug text dumps of the ranking and the queue.

Reference behavior (DEBUG_MODE): after each rank pass it writes
``target/pagerank.txt`` — one ``{page_id}: {score} ({inbound_links})`` line
per node, best score first (pagerank.rs:137-147, data.rs:219-224) — and
after each queue refresh ``target/queue.txt`` — queued URLs in pop order
(data.rs:285-291). Both are written tmp-then-rename.

The dumps stream through ``toLocalIterator`` (driver memory bounded by a
partition); ``top_n`` mirrors the reference's 100_000 cap. Inbound-link
counts exclude self-links but keep duplicates, exactly like the model the
rank operator uses (pagerank.rs:50-55).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def dump_pagerank(engine, path: str, top_n: int = 100_000) -> int:
    """Write the T4 top-scores dump for the engine's committed state.
    Returns the number of lines written."""
    scores = engine.table("scores")
    seen = engine.table("seen")
    edges = engine.table("edges")
    inbound = (edges.where(F.col("src") != F.col("dst"))
               .groupBy("dst").agg(F.count("*").alias("inbound")))
    rows = (scores.join(seen.select("page_id", "node_id"), "node_id")
            .join(inbound, scores["node_id"] == inbound["dst"], "left")
            .select("page_id", "score",
                    F.coalesce("inbound", F.lit(0)).alias("inbound"))
            .orderBy(F.desc("score"), F.asc("page_id"))
            .limit(top_n))
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w") as f:
        for r in rows.toLocalIterator(prefetchPartitions=True):
            f.write(f"{r['page_id']}: {r['score']} ({r['inbound']})\n")
            n += 1
    os.replace(tmp, path)
    return n


def dump_queue(engine, path: str) -> int:
    """Write the S9 queue dump (URLs in pop order). Returns line count."""
    rows = engine.table("queue").orderBy("queue_pos").select("url")
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w") as f:
        for r in rows.toLocalIterator(prefetchPartitions=True):
            f.write(r["url"] + "\n")
            n += 1
    os.replace(tmp, path)
    return n
