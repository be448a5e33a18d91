"""G2/G3 — weighted PageRank as a join-aggregate (pagerank.rs:103-120).

One iteration::

    new[dst] = 0.15 + 0.85 * Σ_src( score[src] / outdeg[src] * weight )

Parity-critical semantics (pagerank.rs:36-101):
- ``outdeg`` counts **all** of a node's links, including self-links and
  duplicates (pagerank.rs:50,78)
- self-links are excluded from inbound contributions (pagerank.rs:52-55)
- nodes with no inbound end at exactly 0.15; brand-new nodes start at 1.0
  (pagerank.rs:27-31)

The edges DataFrame is the raw link list (self-links included) so outdeg can
be derived here.

Physical shape (the 100× design): the two iteration-invariant sides —
``contrib_edges`` (the big one) and ``nodes`` — are cached AFTER an explicit
hash repartition + sort on their join keys. An InMemoryRelation preserves
its child's outputPartitioning AND outputOrdering, so every iteration's
joins reuse the cached layout: only the scores/sums (node-sized, the small
side) move per iteration, and the contribution aggregation's shuffle is the
iteration's only full exchange — the same edge-partition-reuse shape GraphX
uses. A ``localCheckpoint`` here (the pre-round-5 shape) erases both
properties (a LogicalRDD reports unknown partitioning) and re-shuffled +
re-sorted the full edge set every iteration. Score lineage is still cut
with ``localCheckpoint`` every few iterations — 50 chained joins at
bootstrap (data.rs:166-169) would otherwise blow up plan compilation; on a
cluster this is where you'd ``spark.sparkContext.setCheckpointDir`` to
reliable storage instead.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_iterations(nodes: DataFrame, edges: DataFrame, scores: DataFrame,
                        iterations: int, damping: float = 0.85,
                        checkpoint_every: int = 8,
                        cut=None, persist=None, on_timing=None) -> DataFrame:
    """nodes(node_id) · edges(src,dst,weight) · scores(node_id,score) →
    scores after ``iterations`` sweeps. New nodes (absent from ``scores``)
    start at 1.0.

    ``cut``: lineage-cut hook (df → checkpointed df); ``persist``: cache
    hook for the iteration-invariant sides (df → cached df, layout
    preserved). Defaults register with the harness cache scope; the engine
    passes its round-scoped hooks so blocks are reclaimed when the round
    commits. ``on_timing(key, t_start)``: optional sub-stage timing sink.
    """
    base = 1.0 - damping
    if cut is None:
        from .qcache import scoped

        def cut(df):
            # registered with the harness cache scope so a driver-query
            # caller (no round-scoped hook) leaves no cached blocks behind
            return scoped(df.localCheckpoint(eager=True))
    if persist is None:
        from .qcache import scoped_persist
        persist = scoped_persist
    if on_timing is None:
        def on_timing(key, t_start):
            pass

    t0 = time.monotonic()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    contrib_edges = (
        edges.where(F.col("src") != F.col("dst"))
        .join(outdeg, "src")
        .select("src", "dst", (F.col("weight") / F.col("outdeg")).alias("frac"))
        # reused every iteration — cache hash(src)-partitioned and
        # src-sorted so the per-iteration score join is exchange- and
        # sort-free on this (the large) side. No explicit partition count:
        # a user-pinned N disables AQE coalescing, which at small graph
        # sizes pins every one of the ~10 per-iteration stages to N tasks
        # of scheduler floor (measured: 2-5x cold-start cost on the sf0.1
        # driver query); unpinned, AQE sizes the cached layout to the data
        # while full partitions at the 1M-round design point are left
        # uncoalesced, preserving the exchange-free iteration joins.
        .repartition("src")
        .sortWithinPartitions("src")
    )
    contrib_edges = persist(contrib_edges)
    # nodes likewise anchor every iteration's outer join
    nodes = persist(nodes.repartition("node_id")
                    .sortWithinPartitions("node_id"))
    on_timing("plan_invariants", t0)

    t1 = time.monotonic()
    scores = (
        nodes.join(scores, "node_id", "left")
        .select("node_id", F.coalesce("score", F.lit(1.0)).alias("score"))
    )

    for i in range(iterations):
        sums = (
            contrib_edges.join(scores, contrib_edges["src"] == scores["node_id"])
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("score")).alias("s"))
        )
        scores = (
            nodes.join(sums, nodes["node_id"] == sums["dst"], "left")
            .select(
                "node_id",
                (F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                 ).alias("score"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            scores = cut(scores)
    out = cut(scores)
    on_timing("iters", t1)
    return out
