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


LAYOUT_MIN_NODES = 100_000


def pagerank_iterations(nodes: DataFrame, edges: DataFrame, scores: DataFrame,
                        iterations: int, damping: float = 0.85,
                        checkpoint_every: int = 8,
                        cut=None, persist=None, on_timing=None,
                        approx_nodes: int | None = None) -> DataFrame:
    """nodes(node_id) · edges(src,dst,weight) · scores(node_id,score) →
    scores after ``iterations`` sweeps. New nodes (absent from ``scores``)
    start at 1.0.

    ``cut``: lineage-cut hook (df → checkpointed df); ``persist``: cache
    hook for the iteration-invariant sides (df → cached df, layout
    preserved). Defaults register with the harness cache scope; the engine
    passes its round-scoped hooks so blocks are reclaimed when the round
    commits. ``on_timing(key, t_start)``: optional sub-stage timing sink.

    ``approx_nodes``: caller-known graph size (any estimate within ~10x is
    fine — the crawl engine passes its exact seen-count scalar, the
    relational driver query its modulus bound). Below ``LAYOUT_MIN_NODES``
    the hash-partition+sort layout of the invariant sides is skipped: a
    small node side makes every per-iteration score/sum join broadcastable,
    so the layout buys nothing and its setup (two shuffle+sort+persist
    materializations) is the dominant cost of a small-graph run — measured
    ~2-5x of the whole g2 driver query at sf0.1. ``None`` (unknown size)
    keeps the layout: at the 1M-round design point it is worth 12+ s/round.
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
    use_layout = approx_nodes is None or approx_nodes >= LAYOUT_MIN_NODES
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    contrib_edges = (
        edges.where(F.col("src") != F.col("dst"))
        .join(outdeg, "src")
        .select("src", "dst", (F.col("weight") / F.col("outdeg")).alias("frac"))
    )
    if use_layout:
        # reused every iteration — cache hash(src)-partitioned and
        # src-sorted so the per-iteration score join is exchange- and
        # sort-free on this (the large) side. No explicit partition count:
        # a user-pinned N disables AQE coalescing; unpinned (plus the
        # session's canChangeCachedPlanOutputPartitioning=true, which is
        # what actually lets AQE resize a plan feeding a cache), AQE sizes
        # the cached layout to the data while full partitions at the
        # 1M-round design point are left uncoalesced, preserving the
        # exchange-free iteration joins.
        contrib_edges = (contrib_edges.repartition("src")
                         .sortWithinPartitions("src"))
        # nodes likewise anchor every iteration's outer join
        nodes = nodes.repartition("node_id").sortWithinPartitions("node_id")
    contrib_edges = persist(contrib_edges)
    nodes = persist(nodes)
    on_timing("plan_invariants", t0)

    t1 = time.monotonic()
    scores = (
        nodes.join(scores, "node_id", "left")
        .select("node_id", F.coalesce("score", F.lit(1.0)).alias("score"))
    )

    # NOTE: do NOT broadcast-hint the scores/sums sides here, tempting as it
    # looks for small graphs — a BroadcastExchange materializes its subtree
    # as a separate job, and the un-persisted iteration chain would be
    # recomputed from scratch for every iteration's broadcast (O(iters²)
    # work; measured 1.5x slower than letting AQE share the chained
    # shuffle stages within one job).
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
